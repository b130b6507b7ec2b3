"""Native posture kernels (trex_outline_resample / trex_midline_walk)
must be bit-exact with the python reference paths in posture.py —
the kernels mirror numpy float32 arithmetic (including no FMA
contraction, see native/build.py -ffp-contract=off)."""
import numpy as np

from trex_tpu.track.posture import (_midline_walk, _midline_walk_py,
                                    _resample_py, resample)


def _random_outline(rng):
    L = int(rng.integers(10, 300))
    th = np.sort(rng.uniform(0, 2 * np.pi, L))
    r = rng.uniform(5, 40) * (1 + 0.3 * np.sin(3 * th)
                              + rng.normal(0, 0.05, L))
    return np.stack([r * np.cos(th), r * np.sin(th)], 1).astype(
        np.float32) + 100


def test_native_resample_bit_exact():
    rng = np.random.default_rng(7)
    for _ in range(60):
        pts = _random_outline(rng)
        for dist in (0.5, 1.0, 2.0):
            a = resample(pts, dist)
            b = _resample_py(pts, dist)
            assert a.shape == b.shape
            assert np.array_equal(a, b)


def test_native_midline_walk_bit_exact():
    rng = np.random.default_rng(8)
    for _ in range(60):
        pts = _random_outline(rng)
        mo = max(3, int(0.025 * len(pts)))
        wa = _midline_walk(np.ascontiguousarray(pts, np.float32), mo)
        wb = _midline_walk_py(np.ascontiguousarray(pts, np.float32), mo)
        assert wa.shape == wb.shape
        assert np.array_equal(wa, wb)


def test_resample_short_input_passthrough():
    pts = np.array([[0, 0]], np.float32)
    assert resample(pts, 0.5) is pts
    pts2 = np.array([[0, 0], [1, 0]], np.float32)
    # too short to emit: python returns input unchanged
    out = resample(pts2, 10.0)
    assert np.array_equal(out, _resample_py(pts2, 10.0))


def test_outline_resample_reference_vectors():
    """OutlineResampleTest (Application/Tests/test_outlines.cpp:53-95):
    square outline resampled at 5 px -> the 8 expected points; tiny
    distance densifies >100 points; huge distance collapses <3; a
    single point passes through unchanged."""
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)

    got = resample(sq, 5.0)
    want = np.array([[0, 0], [5, 0], [10, 0], [10, 5], [10, 10],
                     [5, 10], [0, 10], [0, 5]], np.float32)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=0.01)

    assert len(resample(sq, 0.1)) > 100
    assert len(resample(sq, 50.0)) < 3

    single = np.array([[0, 0]], np.float32)
    out = resample(single, 5.0)
    assert np.array_equal(out, single)


def test_native_to_dense_bit_exact():
    """trex_blob_dense == the python rasterizer for random multi-run
    blobs at pads 0 and 3."""
    from trex_tpu.track.blob import TrackBlob

    rng = np.random.default_rng(11)
    for _ in range(80):
        K = int(rng.integers(1, 30))
        y = int(rng.integers(0, 50))
        rows = []
        for j in range(K):
            if j and rng.random() < 0.7:
                y += 1
            x0 = int(rng.integers(0, 80))
            rows.append((y, x0, x0 + int(rng.integers(0, 20))))
        lines = np.array(rows, np.int32)
        npx = int(np.sum(lines[:, 2] - lines[:, 1] + 1))
        px = rng.integers(1, 255, npx).astype(np.uint8)
        b = TrackBlob(lines, px)
        for pad in (0, 3):
            m1, g1, o1 = b.to_dense(pad)
            x, y_, w, h = b.bounds
            m2 = np.zeros((h + 2 * pad, w + 2 * pad), np.uint8)
            g2 = np.zeros_like(m2)
            i = 0
            for ly, x0, x1 in lines:
                n = x1 - x0 + 1
                m2[ly - y_ + pad, x0 - x + pad:x0 - x + pad + n] = 1
                g2[ly - y_ + pad, x0 - x + pad:x0 - x + pad + n] = \
                    px[i:i + n]
                i += n
            assert np.array_equal(m1, m2) and np.array_equal(g1, g2)
            assert o1 == (x - pad, y_ - pad)


def test_midline_chain_native_bit_exact():
    """native/posture_chain.cpp trex_midline_chain must reproduce the
    python calculate_midline_from_outline bit-for-bit (segments,
    heights, indices, len, angle, inversion flag) — it replicates
    numpy's pairwise summation and dtype flow, so any drift is a bug."""
    import trex_tpu.track.posture as P
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    rng = np.random.default_rng(7)
    checked = 0
    for trial in range(60):
        n = int(rng.integers(20, 300))
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        a, b = rng.uniform(5, 40), rng.uniform(3, 20)
        r = 1 + 0.1 * np.sin(th * rng.integers(2, 6)) \
            + rng.normal(0, 0.02, n)
        pts = np.stack([a * np.cos(th) * r + 50,
                        b * np.sin(th) * r + 50], 1).astype(np.float32)
        mv = None if trial % 3 == 0 else rng.normal(0, 1, 2)
        P._force_python_chain = True
        try:
            ref = P.calculate_midline_from_outline(pts, s, mv)
        finally:
            P._force_python_chain = False
        got = P.calculate_midline_from_outline(pts, s, mv)
        assert (ref is None) == (got is None), trial
        if ref is None:
            continue
        checked += 1
        assert np.array_equal(ref.segments, got.segments), trial
        assert np.array_equal(ref.heights, got.heights), trial
        assert ref.tail_index == got.tail_index, trial
        assert ref.head_index == got.head_index, trial
        assert ref.len == got.len and ref.angle == got.angle, trial
        assert ref.inverted_because_previous == \
            got.inverted_because_previous, trial
    assert checked >= 40


def test_posture_from_pose_skeleton():
    """Pose keypoints -> outline -> midline (Posture.cpp generateOutline
    + calculate_posture(pose)): a straight 5-point skeleton yields a
    posture whose midline follows the skeleton axis."""
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.posture import (calculate_posture_from_pose,
                                        generate_outline_from_pose)

    s = reset_global_settings()
    # blob roughly covering the skeleton
    lines = np.array([[y, 18, 62] for y in range(24, 37)], np.int32)
    blob = TrackBlob(lines, np.full((37 - 24) * 45, 80, np.uint8))
    kp = np.array([[20.0, 30.0], [30.0, 30.0], [40.0, 30.0],
                   [50.0, 30.0], [60.0, 30.0]])
    res = calculate_posture_from_pose(blob, kp, s)
    assert res is not None and res.midline is not None
    segs = res.midline.segments
    assert len(segs) > 5
    # midline spans the skeleton horizontally (blob-local coords)
    assert res.midline.len > 25
    assert np.ptp(segs[:, 1]) < np.ptp(segs[:, 0])

    # pose_midline_indexes selects a subset
    s.set("pose_midline_indexes", [0, 2, 4])
    res2 = calculate_posture_from_pose(blob, kp, s)
    assert res2 is not None and res2.midline is not None

    # invalid (0,0) points are skipped
    kp2 = np.vstack([[0.0, 0.0], kp])
    out = generate_outline_from_pose(kp2, [], lambda t: 5.0)
    assert len(out) > 0
    assert out[:, 0].min() > 5  # nothing near the (0,0) sentinel


def test_posture_from_detection_outline():
    """Detection original-outline -> midline (Posture.cpp:277-304),
    incl. outline_compression vertex reduction."""
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.posture import calculate_posture_from_outline

    s = reset_global_settings()
    lines = np.array([[y, 10, 70] for y in range(20, 41)], np.int32)
    blob = TrackBlob(lines, np.full(21 * 61, 80, np.uint8))
    t = np.linspace(0, 2 * np.pi, 80, endpoint=False)
    outline = np.stack([40 + 28 * np.cos(t), 30 + 8 * np.sin(t)],
                       axis=1)
    res = calculate_posture_from_outline(blob, outline, s)
    assert res is not None and res.midline is not None
    assert res.midline.len > 30

    s.set("outline_compression", 2.0)
    res2 = calculate_posture_from_outline(blob, outline, s)
    assert res2 is not None
    assert len(res2.outline) <= len(res.outline)


def test_posture_result_offset_is_blob_relative():
    """PostureResult.offset contract: consumers add blob bounds +
    offset (pipeline.run_postures, visual_field.generate_eyes), so the
    pixels path must return a blob-relative crop offset — the global
    outline must land inside the blob bounds (+/- the 1px crop pad)."""
    import numpy as np

    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.posture import calculate_posture

    s = reset_global_settings()
    bg = np.full((100, 100), 200, np.uint8)
    lines, px = [], []
    for y in range(30, 41):
        w = 10 - abs(y - 35)
        lines.append((y, 50 - w, 50 + w))
        px.append(np.full(2 * w + 1, 90, np.uint8))
    b = TrackBlob(np.array(lines, np.int32), np.concatenate(px))
    res = calculate_posture(b, s, bg)
    assert res is not None and res.midline is not None
    bx, by, w, h = b.bounds
    glob = res.outline + np.array([bx + res.offset[0],
                                   by + res.offset[1]])
    assert glob[:, 0].min() >= bx - 1 and glob[:, 0].max() <= bx + w + 1
    assert glob[:, 1].min() >= by - 1 and glob[:, 1].max() <= by + h + 1


def test_posture_batch_full_matches_python_chain():
    """trex_posture_batch_full geometry == calculate_posture (python
    chain) per blob: outline points, midline segments/heights, crop
    offset, length/angle — the archive/export path's source of truth."""
    import numpy as np

    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.posture import (calculate_posture,
                                        posture_batch,
                                        posture_batch_full)

    s = reset_global_settings()
    s.set("outline_resample", 0.5)
    rng = np.random.default_rng(0)
    bg = np.full((200, 200), 200, np.uint8)
    blobs = []
    for k in range(6):
        cx, cy = rng.integers(30, 170, 2)
        lines, px = [], []
        L = int(rng.integers(8, 16))
        for y in range(cy, cy + L):
            w = max(1, L // 2 - abs(y - cy - L // 2))
            lines.append((y, cx - w, cx + w))
            px.append(rng.integers(60, 120, 2 * w + 1).astype(np.uint8))
        blobs.append(TrackBlob(np.array(lines, np.int32),
                               np.concatenate(px)))
    full = posture_batch_full([b.lines for b in blobs],
                              [b.pixels for b in blobs], bg, s)
    ok_s, len_s, ang_s, dir_s = posture_batch(
        [b.lines for b in blobs], [b.pixels for b in blobs], bg, s)
    np.testing.assert_array_equal(full["ok"], ok_s)
    np.testing.assert_array_equal(full["len"], len_s)
    np.testing.assert_array_equal(full["angle"], ang_s)
    np.testing.assert_array_equal(full["dir"], dir_s)
    assert not full["trunc"].any()
    n_checked = 0
    for i, b in enumerate(blobs):
        res = calculate_posture(b, s, bg)
        if not full["ok"][i]:
            assert res is None or res.midline is None
            continue
        n_checked += 1
        m = int(full["n_outline"][i])
        np.testing.assert_allclose(full["outline"][i, :m],
                                   res.outline, rtol=0, atol=1e-6)
        k = int(full["nseg"][i])
        np.testing.assert_allclose(full["seg"][i, :k],
                                   res.midline.segments, rtol=0,
                                   atol=1e-12)
        np.testing.assert_allclose(full["heights"][i, :k],
                                   res.midline.heights, rtol=0,
                                   atol=1e-12)
        assert full["tail"][i] == res.midline.tail_index
        assert full["head"][i] == res.midline.head_index
        assert full["len"][i] == res.midline.len
        assert full["angle"][i] == res.midline.angle
        bx, by = b.bounds[:2]
        # full off is GLOBAL; python offset is blob-relative
        assert (full["off"][i, 0] - bx, full["off"][i, 1] - by) \
            == res.offset
    assert n_checked >= 4
