"""DeviceTracker (track/device_engine.py) vs the host FastTracker:
the product `track_engine=device` path must reproduce the host
engine's assignments frame-exactly, including frames that need
history splits (per-frame host replay splice) — VERDICT r2 item 2/3."""
import numpy as np
import pytest

from trex_tpu.config import reset_global_settings
from trex_tpu.ops.labeling import label_blobs_raw


def _settings(n_fish, split=False):
    s = reset_global_settings()
    s.set("track_max_individuals", n_fish)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_threshold", 20)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[10, 90]])
    s.set("calculate_posture", False)
    s.set("match_mode", "approximate")
    s.set("track_do_history_split", split)
    return s


def _render(positions, size=256):
    img = np.full((size, size), 200, np.uint8)
    for p in positions:
        if p is None:
            continue
        x, y = int(p[0]), int(p[1])
        img[y:y + 6, x:x + 10] = 80
    return img


def _host(frames, bg, s):
    from trex_tpu.track.engine import FastTracker

    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"]),
               track_absolute=bool(s["track_threshold_is_absolute"]))
    tr = FastTracker(s, bg)
    for i, fr in enumerate(frames):
        tr.add_frame(i, i / 25.0, **label_blobs_raw(fr, bg, **det))
    return tr


def _compare_history(host, dev, n_frames):
    for f in range(n_frames):
        hh = host.history.get(f)
        hd = dev.history.get(f)
        hmap = {} if hh is None else {
            int(i): (float(x), float(y))
            for i, x, y in zip(hh["fish"], hh["x"], hh["y"])}
        dmap = {} if hd is None else {
            int(i): (float(x), float(y))
            for i, x, y in zip(hd["fish"], hd["x"], hd["y"])}
        # host history records first-pass matches; the device records
        # every seen fish (incl. creations) — host must be a subset
        # with equal positions, and the device set must equal the
        # host's last_frame bookkeeping
        for fid, (x, y) in hmap.items():
            assert fid in dmap, (f, fid, hmap, dmap)
            assert abs(dmap[fid][0] - x) < 1e-4, (f, fid)
            assert abs(dmap[fid][1] - y) < 1e-4, (f, fid)


def _track_device_blobs(frames, bg, s):
    from trex_tpu.track.device_engine import DeviceTracker

    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"]),
               track_absolute=bool(s["track_threshold_is_absolute"]))
    from trex_tpu.ops.labeling import label_blobs

    dev = DeviceTracker(s, bg, chunk=16)
    for i, fr in enumerate(frames):
        blobs = label_blobs(fr, bg, **det)
        from trex_tpu.track.blob import TrackBlob

        tbs = [TrackBlob(b.lines, b.pixels, stats=b.stats)
               for b in blobs]
        dev.add_frame_blobs(i, i / 25.0, tbs)
    dev.finalize()
    return dev


def test_device_engine_matches_fast_separated():
    """Well-separated fish: zero flags, pure device path."""
    n = 4
    s = _settings(n)
    rng = np.random.default_rng(1)
    pos = np.array([[30.0 + 50 * i, 40.0 + 40 * i] for i in range(n)])
    vel = rng.normal(0, 1.5, (n, 2))
    frames = []
    for _ in range(40):
        frames.append(_render(pos))
        pos = np.clip(pos + vel, 5, 230)
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    s2 = _settings(n)
    dev = _track_device_blobs(frames, bg, s2)
    assert not dev.assist_frames, dev.assist_frames
    _compare_history(host, dev, len(frames))
    assert dev.n_fish == host.n_fish


def test_device_engine_matches_fast_merge_heavy():
    """Two fish cross repeatedly: merged blobs exceed the size max and
    trigger history splits — the splice replay must keep the device
    history byte-equal to the host engine's."""
    n = 2
    s = _settings(n, split=True)
    frames = []
    for f in range(60):
        # fish approach, overlap around frames 20-40, separate again
        dx = abs(30 - f) - 10
        x0 = 120 - max(0, dx)
        x1 = 130 + max(0, dx)
        frames.append(_render([[x0, 100], [x1, 100]]))
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    s2 = _settings(n, split=True)
    dev = _track_device_blobs(frames, bg, s2)
    assert dev.assist_frames, "expected split frames to use the assist"
    # the assist must be per-frame, not whole-chunk: fewer assist
    # frames than total frames
    assert len(dev.assist_frames) < len(frames)
    _compare_history(host, dev, len(frames))


def test_device_engine_track_frames_fused():
    """track_frames: fused device detection + scan, same result."""
    n = 3
    s = _settings(n)
    rng = np.random.default_rng(3)
    pos = np.array([[40.0 + 60 * i, 60.0 + 50 * i] for i in range(n)])
    vel = rng.normal(0, 2.0, (n, 2))
    frames = []
    for _ in range(30):
        frames.append(_render(pos))
        pos = np.clip(pos + vel, 5, 230)
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    s2 = _settings(n)
    from trex_tpu.track.device_engine import DeviceTracker

    dev = DeviceTracker(s2, bg, chunk=8).track_frames(
        np.stack(frames))
    _compare_history(host, dev, len(frames))


def test_cli_track_device_engine(tmp_path):
    """-task track with track_engine=device writes the FULL product
    export (per-fish CSVs + .results) through the archive path."""
    n = 4
    s = _settings(n)
    rng = np.random.default_rng(5)
    pos = np.array([[30.0 + 50 * i, 40.0 + 40 * i] for i in range(n)])
    vel = rng.normal(0, 1.5, (n, 2))
    frames = []
    for _ in range(20):
        frames.append(_render(pos))
        pos = np.clip(pos + vel, 5, 230)
    # write a pv via the convert pipeline
    import cv2

    src = tmp_path / "vid"
    src.mkdir()
    for i, fr in enumerate(frames):
        cv2.imwrite(str(src / f"f_{i:03d}.jpg"),
                    fr, [cv2.IMWRITE_JPEG_QUALITY, 100])
    from trex_tpu.cli.trex import main

    out = tmp_path / "out"
    rc = main(["-i", str(src / "f_%03d.jpg"), "-o", "vid",
               "-d", str(out), "-task", "convert", "-nowindow",
               "-auto_quit",
               "-track_max_individuals", str(n),
               "-track_threshold", "20",
               "-track_max_speed", "300",
               "-track_size_filter", "[[10,90]]",
               "-detect_threshold", "20",
               "-average_samples", "5",
               "-meta_encoding", "gray",
               "-calculate_posture", "false"])
    assert rc == 0
    rc = main(["-i", str(out / "vid.pv"), "-d", str(out / "t"),
               "-task", "track", "-nowindow", "-auto_quit",
               "-track_engine", "device",
               "-match_mode", "approximate",
               "-calculate_posture", "false"])
    assert rc == 0
    # default output_format=npz, individual_prefix=id
    files = sorted((out / "t" / "data").glob("vid_id*.npz"))
    assert files, list((out / "t" / "data").iterdir())
    d = np.load(files[0])
    assert "frame" in d.files and len(d["frame"]) > 10
    # .results lands beside the pv file (reference convention)
    assert (out / "vid.results").exists()


def test_device_engine_multirange_size_filter():
    """Multi-range track_size_filter: the host drops gap-size blobs
    (in no range and below the max range's lo — 'small' in
    build_candidates) before matching; the device's collapsed
    [min, max] pair used to keep them matchable, silently diverging.
    Fish 0's blob vanishes and a gap-size decoy appears at its
    expected position — both engines must leave fish 0 unmatched."""
    n = 2
    s = _settings(n)
    s.set("track_size_filter", [[10, 45], [100, 400]])
    frames = []
    for f in range(30):
        img = np.full((256, 256), 200, np.uint8)
        if f < 15:
            # in-range fish 0 (4x8 = 32 px), moving right
            img[40:44, 30 + 2 * f:38 + 2 * f] = 80
        else:
            # gap-size decoy (6x10 = 60 px: in no range, < max lo)
            # parked exactly on fish 0's extrapolated path
            img[38:44, 28 + 2 * f:38 + 2 * f] = 80
        # in-range fish 1, far away
        img[200:204, 30 + 2 * f:38 + 2 * f] = 80
        frames.append(img)
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    s2 = _settings(n)
    s2.set("track_size_filter", [[10, 45], [100, 400]])
    # the pv/blob path filters in the host candidate table already;
    # the FUSED frames path must apply the same in-any-range test in
    # the scan itself
    from trex_tpu.track.device_engine import DeviceTracker

    dev = DeviceTracker(s2, bg, chunk=10).track_frames(
        np.stack(frames))
    _compare_history(host, dev, len(frames))
    # the decoy must never be matched by either engine
    for f in range(15, 30):
        hd = dev.history.get(f)
        if hd is None:
            continue
        for fid, x in zip(hd["fish"], hd["x"]):
            if int(fid) == 0:
                assert float(x) < 28 + 2 * 15, (f, x)


def test_device_fused_multirange_detect_filter():
    """Multi-range detect_size_filter on the fused frames path: a
    gap-size blob must be dropped by the on-device detection like the
    host pipeline drops it (pipeline._detect_frame's in-any-range
    test), so no individual is ever created for it."""
    from trex_tpu.track.device_engine import DeviceTracker

    s = _settings(1)
    s.set("detect_size_filter", [[10, 45], [100, 400]])
    frames = []
    for _ in range(8):
        img = np.full((128, 128), 200, np.uint8)
        img[60:66, 50:60] = 80       # 60 px: in no detect range
        frames.append(img)
    bg = np.full((128, 128), 200, np.uint8)
    dev = DeviceTracker(s, bg, chunk=8).track_frames(np.stack(frames))
    assert dev.n_fish == 0, dev.n_fish


def test_device_engine_demotes_on_assist_storm():
    """When assists dominate (every frame merge-contested), the
    engine demotes to pure host tracking — history must still match
    the host engine exactly and the demoted flag must be set (each
    assist otherwise costs a device relaunch, making the hybrid far
    slower than the host engine)."""
    n = 2
    s = _settings(n, split=True)
    frames = []
    for f in range(80):  # past demote_min_frames (64)
        # pair drifts right, merging every other frame: fish exist
        # and every merged frame is split-contested, so the assist
        # rate stays ~50% and crosses the demotion threshold
        x = 60 + f
        gap = 6 if f % 2 else 14
        frames.append(_render([[x, 100], [x + gap, 100]]))
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    assert any(len(h["fish"]) for h in host.history.values())
    s2 = _settings(n, split=True)
    dev = _track_device_blobs(frames, bg, s2)
    assert dev.demoted, (len(dev.assist_frames), dev._frames_done)
    _compare_history(host, dev, len(frames))


def test_device_engine_decay_matches_fast():
    """track_speed_decay < 1: the scan's in-graph window estimate
    (_decay_estimates) must reproduce the host engine's assignments;
    chain-broken fish flag the frame for the exact host replay."""
    n = 6
    s = _settings(n)
    s.set("track_speed_decay", 0.7)
    rng = np.random.default_rng(7)
    pos = rng.uniform(20, 200, (n, 2))
    vel = rng.normal(0, 2.0, (n, 2))
    frames = []
    for _ in range(40):
        frames.append(_render(pos))
        vel += rng.normal(0, 0.5, vel.shape)
        vel = np.clip(vel, -4, 4)
        pos = np.clip(pos + vel, 10, 230)
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    assert host.decay_active
    dev = _track_device_blobs(frames, bg, s)
    _compare_history(host, dev, len(frames))


def test_device_engine_decay_gap_reactivation():
    """A fish vanishing for a few frames (chain break) stays on-device:
    the carry's accumulated chain walk (dacc) reproduces the host's
    exact scalar estimate over the gap, so the history matches with no
    replay (round 5: gap frames previously ALL deferred to the host —
    the bulk of crowded-scene deferral)."""
    n = 3
    s = _settings(n)
    s.set("track_speed_decay", 0.7)
    base = np.array([[40.0, 60.0], [120.0, 60.0], [200.0, 120.0]])
    frames = []
    for i in range(30):
        p = base + np.array([i * 1.5, 0.0])
        pts = [None if (k == 1 and 10 <= i < 14) else p[k]
               for k in range(n)]
        frames.append(_render(pts))
    bg = np.full((256, 256), 200, np.uint8)
    host = _host(frames, bg, s)
    dev = _track_device_blobs(frames, bg, s)
    _compare_history(host, dev, len(frames))
    assert len(dev.assist_frames) <= 2, (
        "gap frames should track in-graph now", dev.assist_frames)


def test_auto_promotes_to_device_on_healthy_accelerator(monkeypatch):
    """track_engine=auto selects the device engine when a healthy
    accelerator answers the probe, falls back to the fast engine on a
    sick tunnel, and to the object tracker for unsupported configs."""
    from trex_tpu import pipeline
    from trex_tpu.track import Tracker
    from trex_tpu.track.device_engine import DeviceTracker
    from trex_tpu.track.engine import FastTracker

    bg = np.zeros((32, 32), np.uint8)
    s = _settings(4)
    monkeypatch.setattr(pipeline, "_accelerator_healthy", lambda: True)
    tr = pipeline.select_tracker(s, bg, need_individuals=True)
    assert isinstance(tr, DeviceTracker) and tr.archive_mode
    monkeypatch.setattr(pipeline, "_accelerator_healthy",
                        lambda: False)
    tr = pipeline.select_tracker(s, bg, need_individuals=True)
    assert isinstance(tr, FastTracker)
    # an engine-unsupported config falls through to the object tracker
    monkeypatch.setattr(pipeline, "_accelerator_healthy", lambda: True)
    s.set("manual_matches", {0: {0: 123}})
    tr = pipeline.select_tracker(s, bg, need_individuals=True)
    assert isinstance(tr, Tracker)


def test_rebuild_dacc_accepts_device_windows():
    """Regression: the assist's dacc rebuild receives the DEVICE
    (F, W, 5) window (with the global-step column) — it must slice to
    the scalar walk's 4 columns instead of unpacking 5 (this crashed
    whenever an assist fired while another fish had a frame gap, which
    only reproduced when the auto-promotion probe routed a test onto
    the real accelerator)."""
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.device_engine import _rebuild_dacc

    s = reset_global_settings()
    s.set("track_speed_decay", 0.7)
    s.set("track_max_speed", 800)
    s.set("cm_per_pixel", 1.0)
    F, W = 3, 7
    win = np.zeros((F, W, 5))
    win[:, :, 0] = -1e9
    frame_times = {f: f / 25.0 for f in range(0, 40)}
    # fish 1: seen at frames 24..30, now unassigned with a gap to 34
    for k, f in enumerate(range(24, 31)):
        win[1, k] = (f, 10.0 + 2 * (f - 24), 5.0, f / 25.0, 0.04)
    got = np.array([True, False, False])
    dacc = _rebuild_dacc(win, got, 34, np.ones((F, 3)), frame_times, s)
    # assigned fish reset; empty-window fish untouched beyond reset
    assert np.all(dacc[0] == 0.0)
    # gap fish: walk accumulated a positive +x displacement (moving
    # +2 px/frame) with a packing-scale error
    assert dacc[1, 0] > 0.0
    assert 0 < dacc[1, 2] < 1e-4
    # fish 2 has no window entries: prev value was reset-or-kept path
    assert np.all(dacc[2] == 1.0)  # untouched (no entries, not got)
