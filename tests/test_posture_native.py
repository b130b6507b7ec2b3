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
