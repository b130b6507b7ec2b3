"""FastTracker batched native posture (VERDICT r2 item 5): the engine
now computes posture for every assignment through one native call per
frame (native/posture_chain.cpp trex_posture_batch). Differential: the
object Tracker's per-individual posture chain must produce the same
midline lengths/angles for the same assignments."""
import numpy as np

from trex_tpu.config import reset_global_settings
from trex_tpu.ops.labeling import label_blobs_raw


def _settings(n_fish):
    s = reset_global_settings()
    s.set("track_max_individuals", n_fish)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_threshold", 20)
    s.set("track_posture_threshold", 20)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[10, 400]])
    s.set("calculate_posture", True)
    s.set("match_mode", "automatic")
    s.set("outline_resample", 0.5)
    return s


def _render(positions, size=256):
    img = np.full((size, size), 200, np.uint8)
    stamp = np.zeros((9, 15), np.uint8)
    stamp[2:7, 1:14] = 90
    stamp[3:6, 0:15] = 110
    for p in positions:
        x, y = int(p[0]), int(p[1])
        region = img[y:y + 9, x:x + 15]
        np.minimum(region, 200 - stamp[:region.shape[0],
                                       :region.shape[1]], out=region)
    return img


def test_engine_posture_matches_object_tracker():
    n = 3
    s = _settings(n)
    rng = np.random.default_rng(7)
    pos = np.array([[40.0 + 60 * i, 60.0 + 50 * i] for i in range(n)])
    vel = rng.normal(0, 1.5, (n, 2))
    frames = []
    for _ in range(15):
        frames.append(_render(pos))
        pos = np.clip(pos + vel, 5, 230)
    bg = np.full((256, 256), 200, np.uint8)

    from trex_tpu.track.engine import FastTracker

    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"]),
               track_absolute=bool(s["track_threshold_is_absolute"]))
    eng = FastTracker(s, bg)
    assert eng.do_posture
    for i, fr in enumerate(frames):
        eng.add_frame(i, i / 25.0, **label_blobs_raw(fr, bg, **det))
    assert eng.posture_history, "no posture computed"

    # object tracker on the same frames
    from trex_tpu.pipeline import run_postures
    from trex_tpu.track import TrackBlob, Tracker
    from trex_tpu.ops.labeling import label_blobs

    s2 = _settings(n)
    trk = Tracker(s2, background=bg)
    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(2)
    for i, fr in enumerate(frames):
        blobs = [TrackBlob(b.lines, b.pixels, stats=b.stats)
                 for b in label_blobs(fr, bg, **det)]
        pp = trk.preprocess_frame(i, blobs, time=i / 25.0)
        trk.add(pp)
        run_postures(trk, i, s2, pool)
    pool.shutdown()

    # match engine fish to tracker individuals by final position
    matched = 0
    for f in range(len(frames)):
        ph = eng.posture_history.get(f)
        if ph is None:
            continue
        eh = eng.history.get(f)
        pos_of = {int(i): (x, y) for i, x, y in
                  zip(eh["fish"], eh["x"], eh["y"])}
        for k, fid in enumerate(ph["fish"]):
            if not ph["ok"][k]:
                continue
            ex, ey = pos_of[int(fid)]
            # find the individual at this position in this frame
            for ind in trk.individuals.values():
                b = ind.basic_stuff(f)
                if b is None:
                    continue
                cx, cy = b.centroid.pos
                if abs(cx - ex) < 1e-6 and abs(cy - ey) < 1e-6:
                    pstuff = ind.posture_stuff(f)
                    if pstuff is None or pstuff.midline is None:
                        break
                    assert abs(pstuff.midline.len
                               - ph["midline_length"][k]) < 1e-9, \
                        (f, fid, pstuff.midline.len,
                         ph["midline_length"][k])
                    matched += 1
                    break
    assert matched >= 30, f"too few posture comparisons: {matched}"


def test_peak_mode_broad_picks_widest_peak():
    """peak_mode=broad: the tail is the WIDEST curvature peak
    (Outline.cpp FIND_BROAD), not the sharpest. Shape: a drop-like
    outline with one sharp spike and one broad bulge — pointy picks
    the spike end, broad picks the bulge end."""
    import numpy as np

    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.posture import (calculate_midline_from_outline,
                                        peak_half_width,
                                        periodic_curvature,
                                        find_peak_indices)

    s = reset_global_settings()
    s.set("outline_smooth_samples", 0)
    s.set("outline_approximate", 0)

    # teardrop: broad circular end (left) + sharp point (right)
    t = np.linspace(0, 2 * np.pi, 120, endpoint=False)
    r = 10.0 + 6.0 * np.cos(t / 2.0) ** 8  # bulge near t=0
    pts = np.stack([r * np.cos(t), 8.0 * np.sin(t)], 1)
    pts += 50.0

    rng = max(1, int(s["outline_curvature_range_ratio"] * len(pts)))
    curv = periodic_curvature(pts, rng)
    peaks = find_peak_indices(curv)
    sharp = max(peaks, key=lambda i: curv[i])
    broad = max(peaks, key=lambda i: (peak_half_width(curv, i),
                                      curv[i]))
    if sharp == broad:
        import pytest

        pytest.skip("synthetic shape produced one dominant peak")
    m_pointy = calculate_midline_from_outline(pts, s)
    s.set("peak_mode", "broad")
    m_broad = calculate_midline_from_outline(pts, s)
    assert m_pointy is not None and m_broad is not None
    # the two modes anchor the midline at different ends
    assert not np.allclose(m_pointy.segments[0], m_broad.segments[0],
                           atol=2.0)
