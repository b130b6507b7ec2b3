"""Connected-components labeling tests: cross-checked against
scipy.ndimage.label (8-connectivity) and bg-subtraction semantics."""
import numpy as np
import pytest
from scipy import ndimage

from trex_tpu.ops.labeling import Blob, label_blobs


def _assert_matches_scipy(mask: np.ndarray, blobs):
    structure = np.ones((3, 3), int)  # 8-connectivity
    labels, n = ndimage.label(mask > 0, structure=structure)
    assert len(blobs) == n
    # every blob's pixels must carry one unique scipy label
    seen = set()
    total = 0
    for b in blobs:
        ids = set()
        for y, x0, x1 in b.lines:
            ids.update(labels[y, x0 : x1 + 1].tolist())
        assert len(ids) == 1, f"blob spans scipy labels {ids}"
        lbl = ids.pop()
        assert lbl != 0 and lbl not in seen
        seen.add(lbl)
        total += b.num_pixels
    assert total == int(np.count_nonzero(mask))


def test_simple_shapes():
    img = np.zeros((40, 60), np.uint8)
    img[5:10, 5:15] = 200          # rectangle
    img[20:25, 20] = 100           # vertical line
    img[30, 40:50] = 50            # horizontal line
    blobs = label_blobs(img)
    assert len(blobs) == 3
    _assert_matches_scipy(img, blobs)
    # pixels are the raw image values in scan order
    rect = max(blobs, key=lambda b: b.num_pixels)
    assert rect.num_pixels == 50
    assert (rect.pixels == 200).all()
    assert rect.bounds() == (5, 5, 10, 5)


def test_diagonal_connectivity():
    img = np.zeros((10, 10), np.uint8)
    img[2, 2] = 1
    img[3, 3] = 1  # touches diagonally => same blob (8-connectivity)
    blobs = label_blobs(img)
    assert len(blobs) == 1
    assert blobs[0].num_pixels == 2


def test_u_shape_merge():
    # two arms joined at the bottom: union-find must merge labels
    img = np.zeros((10, 10), np.uint8)
    img[0:8, 1] = 9
    img[0:8, 5] = 9
    img[8, 1:6] = 9
    blobs = label_blobs(img)
    assert len(blobs) == 1
    _assert_matches_scipy(img, blobs)


def test_random_images_match_scipy():
    rng = np.random.default_rng(42)
    for density in (0.1, 0.4, 0.6):
        img = (rng.random((80, 120)) < density).astype(np.uint8) * 255
        blobs = label_blobs(img)
        _assert_matches_scipy(img, blobs)


def test_background_absolute_threshold():
    bg = np.full((20, 20), 100, np.uint8)
    img = bg.copy()
    img[5, 5] = 120   # +20
    img[6, 5] = 85    # -15
    img[10, 10] = 105  # +5 below threshold
    blobs = label_blobs(img, bg, threshold=10, absolute=True)
    # (5,5) and (6,5) vertically adjacent -> one blob; (10,10) filtered
    assert len(blobs) == 1
    assert blobs[0].num_pixels == 2
    assert sorted(blobs[0].pixels.tolist()) == [85, 120]


def test_background_signed_threshold():
    bg = np.full((20, 20), 100, np.uint8)
    img = bg.copy()
    img[5, 5] = 120   # brighter: excluded in signed mode
    img[8, 8] = 80    # darker by 20: included
    blobs = label_blobs(img, bg, threshold=10, absolute=False)
    assert len(blobs) == 1
    assert blobs[0].lines.tolist() == [[8, 8, 8]]


def test_empty_image():
    assert label_blobs(np.zeros((5, 5), np.uint8)) == []


def test_blob_center():
    img = np.zeros((10, 10), np.uint8)
    img[4:6, 2:8] = 1
    b = label_blobs(img)[0]
    cx, cy = b.center()
    assert cx == pytest.approx(4.5)
    assert cy == pytest.approx(4.5)


def test_native_bgsub_matches_numpy():
    """The native labeler's background-subtraction semantics
    (RawProcessing::generate_binary, BackgroundSubtraction.cpp:126-347):
    |frame - bg| >= threshold keeps the frame value, blobs label the
    nonzero survivors. (ops/bgsub.py was folded into ops/runcc's fused
    mask — this pins the shared semantics at the labeling boundary.)"""
    rng = np.random.default_rng(1)
    bg = rng.integers(0, 255, (32, 48), np.uint8)
    img = rng.integers(0, 255, (32, 48), np.uint8)
    expect = np.where((np.abs(img.astype(int) - bg.astype(int)) >= 25)
                      & (img > 0), img, 0).astype(np.uint8)
    blobs = label_blobs(img, bg, threshold=25, absolute=True)
    _assert_matches_scipy(expect, blobs)


def test_threshold_blob_native_matches_python_path():
    """trex_threshold_blob == the python crop+label path of
    prefilter.threshold_components (lines, pixels, and stat sums)."""
    import numpy as np

    from trex_tpu.ops.labeling import label_blobs, threshold_blob_native
    from trex_tpu.track.blob import TrackBlob

    rng = np.random.default_rng(3)
    bg = np.full((120, 120), 200, np.uint8)
    for trial in range(60):
        K = int(rng.integers(2, 25))
        y = int(rng.integers(2, 90))
        rows = []
        for j in range(K):
            if j and rng.random() < 0.75:
                y += 1
            x0 = int(rng.integers(2, 80))
            rows.append((y, x0, x0 + int(rng.integers(0, 25))))
        lines = np.array(rows, np.int32)
        npx = int(np.sum(lines[:, 2] - lines[:, 1] + 1))
        px = rng.integers(150, 210, npx).astype(np.uint8)
        blob = TrackBlob(lines, px)

        native = threshold_blob_native(lines, px, bg, 20, False)

        mask, gray, (ox, oy) = blob.to_dense(pad=1)
        bg_crop = np.zeros_like(gray)
        ys0, ys1 = max(0, oy), min(120, oy + gray.shape[0])
        xs0, xs1 = max(0, ox), min(120, ox + gray.shape[1])
        bg_crop[ys0 - oy:ys1 - oy, xs0 - ox:xs1 - ox] = \
            bg[ys0:ys1, xs0:xs1]
        img = np.where(mask > 0, gray, bg_crop)
        ref = label_blobs(img, bg_crop, threshold=20, absolute=False)

        assert len(native) == len(ref)
        na = sorted(native, key=lambda c: (int(c.lines[0, 0]),
                                           int(c.lines[0, 1])))
        rf = sorted(ref, key=lambda c: (int(c.lines[0, 0]) + oy,
                                        int(c.lines[0, 1]) + ox))
        for a, b in zip(na, rf):
            shifted = b.lines.copy()
            shifted[:, 0] += oy
            shifted[:, 1] += ox
            shifted[:, 2] += ox
            assert np.array_equal(a.lines, shifted)
            assert np.array_equal(a.pixels, b.pixels)
            assert a.stats[0] == b.stats[0]
            assert a.stats[2] == b.stats[2] + b.stats[0] * ox
            assert a.stats[3] == b.stats[3] + b.stats[0] * oy
