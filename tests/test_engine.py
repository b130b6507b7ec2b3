"""Differential test: FastTracker (SoA engine) vs Tracker (reference
implementation) — frame-by-frame assignments must match exactly on a
synthetic multi-fish video with merges, splits and reactivations."""
import numpy as np
import pytest

from trex_tpu.config import reset_global_settings
from trex_tpu.ops.labeling import label_blobs_raw
from trex_tpu.pipeline import detect_frame
from trex_tpu.track import Tracker
from trex_tpu.track.engine import EngineUnsupported, FastTracker


def _settings(n_fish):
    s = reset_global_settings()
    s.set("track_max_individuals", n_fish)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_threshold", 20)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[20, 400]])
    s.set("calculate_posture", False)
    s.set("match_mode", "automatic")
    return s


def _synth(n_frames, n_fish, size, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(30, size - 30, (n_fish, 2))
    vel = rng.normal(0, 2.0, (n_fish, 2))
    stamp = np.zeros((9, 15), np.uint8)
    stamp[2:7, 1:14] = 90
    stamp[3:6, 0:15] = 110
    bg = np.full((size, size), 200, np.uint8)
    frames = []
    for _ in range(n_frames):
        img = bg.copy()
        vel += rng.normal(0, 0.6, vel.shape)
        np.clip(vel, -4, 4, out=vel)
        pos += vel
        pos = np.clip(pos, 20, size - 25)
        for (x, y) in pos:
            xi, yi = int(x), int(y)
            region = img[yi:yi + 9, xi:xi + 15]
            np.minimum(region, 200 - stamp[:region.shape[0],
                                           :region.shape[1]], out=region)
        frames.append(img)
    return bg, frames


def _tracker_assignments(tracker, frames_n):
    out = {}
    for fid, ind in tracker.individuals.items():
        for b in ind.basic:
            out.setdefault(b.frame, {})[fid] = (
                round(b.centroid.x, 6), round(b.centroid.y, 6))
    return out


def _engine_assignments(eng):
    out = {}
    for frame, h in eng.history.items():
        out[frame] = {int(f): (round(float(x), 6), round(float(y), 6))
                      for f, x, y in zip(h["fish"], h["x"], h["y"])}
    return out


@pytest.mark.parametrize("n_fish,size,seed,mode", [
    (32, 256, 1, "automatic"), (64, 384, 2, "automatic"),
    (128, 512, 3, "automatic"), (48, 320, 5, "hungarian"),
    (48, 320, 5, "tree"), (48, 320, 5, "approximate")])
def test_engine_matches_tracker(n_fish, size, seed, mode):
    s = _settings(n_fish)
    s.set("match_mode", mode)
    bg, frames = _synth(40, n_fish, size, seed)
    tracker = Tracker(s, background=bg)
    eng = FastTracker(s, background=bg)
    for i, f in enumerate(frames):
        pp = tracker.preprocess_frame(i, detect_frame(f, bg, s),
                                      time=i / 25.0)
        tracker.add(pp)
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=bool(s["detect_threshold_is_absolute"]),
            track_threshold=20, track_absolute=False)
        eng.add_frame(i, i / 25.0, **raw)
    ta = _tracker_assignments(tracker, len(frames))
    ea = _engine_assignments(eng)
    for i in range(len(frames)):
        assert ta.get(i, {}) == ea.get(i, {}), (
            f"frame {i}: tracker={sorted(ta.get(i, {}).items())} "
            f"engine={sorted(ea.get(i, {}).items())}")
    # per-frame statistics agree too
    for i in range(len(frames)):
        assert tracker.statistics[i].number_fish \
            == eng.statistics[i].number_fish


def test_native_phases_match_python_phases():
    """FastTracker with native C++ phases (caches/match/reactivate)
    must equal FastTracker running the numpy reference phases."""
    s = _settings(64)
    bg, frames = _synth(40, 64, 384, 7)
    nat = FastTracker(s, background=bg)
    py = FastTracker(s, background=bg)
    py.use_native = False
    for i, f in enumerate(frames):
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=False, track_threshold=20, track_absolute=False)
        nat.add_frame(i, i / 25.0, **raw)
        py.add_frame(i, i / 25.0, **raw)
    assert _engine_assignments(nat) == _engine_assignments(py)
    np.testing.assert_array_equal(nat.last_frame, py.last_frame)
    np.testing.assert_array_equal(nat.trk_start, py.trk_start)


def test_dense_cliques_pending_path():
    """Very dense fish force cliques beyond the native tree budget
    (>8 fish) so the pending-edge escape to the Python matcher runs;
    native and python phases must still agree frame-exactly."""
    s = _settings(24)
    s.set("track_max_speed", 2000)  # everyone sees everyone
    rng = np.random.default_rng(4)
    size = 160
    bg = np.full((size, size), 200, np.uint8)
    pos = rng.uniform(20, size - 30, (24, 2))
    frames = []
    for i in range(15):
        img = bg.copy()
        pos += rng.normal(0, 1.5, pos.shape)
        pos = np.clip(pos, 10, size - 20)
        for (x, y) in pos:
            xi, yi = int(x), int(y)
            img[yi:yi + 7, xi:xi + 9] = 90
        frames.append(img)
    nat = FastTracker(s, background=bg)
    py = FastTracker(s, background=bg)
    py.use_native = False
    tracker = Tracker(s, background=bg)
    for i, f in enumerate(frames):
        raw = label_blobs_raw(f, bg, threshold=int(s["detect_threshold"]),
                              absolute=False, track_threshold=20,
                              track_absolute=False)
        nat.add_frame(i, i / 25.0, **raw)
        py.add_frame(i, i / 25.0, **raw)
        pp = tracker.preprocess_frame(i, detect_frame(f, bg, s),
                                      time=i / 25.0)
        tracker.add(pp)
    assert _engine_assignments(nat) == _engine_assignments(py)
    assert _engine_assignments(nat) == _tracker_assignments(tracker, 15)


def test_fast_engine_through_tracking_state(tmp_path):
    """track_engine=fast drives the product track task on a pv file
    (stats computed natively from the stored blobs via
    trex_blob_stats)."""
    import cv2

    from trex_tpu.pipeline import Segmenter, TrackingState

    s = _settings(8)
    s.set("detect_threshold", 15)
    s.set("detect_threshold_is_absolute", False)
    s.set("meta_encoding", "gray")
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    bg = np.full((128, 128), 200, np.uint8)
    for i in range(12):
        img = bg.copy()
        for k in range(8):
            img[20 + k * 12:26 + k * 12, 10 + i * 3:20 + i * 3] = 90
        cv2.imwrite(str(frames_dir / f"f_{i:03d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
    seg = Segmenter(s, str(frames_dir / "f_%03d.jpg"),
                    tmp_path / "t.pv", track=False)
    seg.run()
    s.set("track_engine", "fast")
    state = TrackingState(s, tmp_path / "t.pv", need_individuals=False)
    tr = state.run()
    assert type(tr).__name__ == "FastTracker"
    assert len(tr.history) == 12 and tr.n_fish == 8
    # object tracker on the same pv agrees on per-frame positions
    s2 = _settings(8)
    s2.set("meta_encoding", "gray")
    s2.set("track_engine", "object")
    state2 = TrackingState(s2, tmp_path / "t.pv")
    tr2 = state2.run()
    for frame, h in tr.history.items():
        ours = {(round(float(x), 6), round(float(y), 6))
                for x, y in zip(h["x"], h["y"])}
        theirs = set()
        for ind in tr2.individuals.values():
            b = ind.basic_stuff(frame)
            if b is not None:
                theirs.add((round(b.centroid.x, 6),
                            round(b.centroid.y, 6)))
        assert ours == theirs, f"frame {frame}"


def test_engine_rejects_unsupported():
    # posture is now supported via the native batch chain — but only
    # without closing steps
    s = _settings(8)
    s.set("calculate_posture", True)
    s.set("posture_closing_steps", 2)
    with pytest.raises(EngineUnsupported):
        FastTracker(s, background=np.zeros((16, 16), np.uint8))
    s = _settings(8)
    s.set("manual_matches", {0: {0: 123}})
    with pytest.raises(EngineUnsupported):
        FastTracker(s, background=np.zeros((16, 16), np.uint8))


def test_split_batch_matches_per_blob_calls():
    """The one-call batched split (trex_split_execute_batch) returns
    byte-identical pieces to per-blob _split_native calls on crowded
    frames that trigger history splits."""
    n_fish, size = 48, 256
    s = _settings(n_fish)
    bg = np.full((size, size), 200, np.uint8)
    frames = _synth(30, n_fish, size, seed=5)[1]
    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"]),
               track_absolute=bool(s["track_threshold_is_absolute"]))
    tr = FastTracker(s, background=bg)
    checked = 0
    orig_batch = FastTracker._split_native_batch

    def checking(self, table, jobs):
        nonlocal checked
        batched = orig_batch(self, table, jobs)
        for (bi, want), parts in zip(jobs, batched):
            single = self._split_native(table, bi, want)
            assert len(single) == len(parts)
            for a, b in zip(single, parts):
                assert a.num_pixels == b.num_pixels
                assert a.center == b.center
                assert a.bounds == b.bounds
            checked += 1
        return batched

    FastTracker._split_native_batch = checking
    try:
        for i, fr in enumerate(frames):
            tr.add_frame(i, i / 25.0, **label_blobs_raw(fr, bg, **det))
    finally:
        FastTracker._split_native_batch = orig_batch
    assert checked > 0  # the crowded video must exercise the batch


@pytest.mark.parametrize("n_fish,size,seed,decay", [
    (32, 256, 1, 0.7), (64, 384, 2, 0.7), (24, 224, 9, 0.4),
    (48, 320, 11, 0.95)])
def test_engine_matches_tracker_speed_decay(n_fish, size, seed, decay):
    """track_speed_decay < 1: the engine's window-based decay
    extrapolation (cache_batch.window_motion + the scalar port) must
    reproduce the object tracker's cache_for_frame estimates — the
    golden fixture runs decay 0.7 (videos/test.settings)."""
    s = _settings(n_fish)
    s.set("track_speed_decay", decay)
    bg, frames = _synth(40, n_fish, size, seed)
    tracker = Tracker(s, background=bg)
    eng = FastTracker(s, background=bg)
    assert eng.decay_active
    for i, f in enumerate(frames):
        pp = tracker.preprocess_frame(i, detect_frame(f, bg, s),
                                      time=i / 25.0)
        tracker.add(pp)
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=bool(s["detect_threshold_is_absolute"]),
            track_threshold=20, track_absolute=False)
        eng.add_frame(i, i / 25.0, **raw)
    ta = _tracker_assignments(tracker, len(frames))
    ea = _engine_assignments(eng)
    for i in range(len(frames)):
        assert ta.get(i, {}) == ea.get(i, {}), (
            f"frame {i}: tracker={sorted(ta.get(i, {}).items())} "
            f"engine={sorted(ea.get(i, {}).items())}")


def test_engine_decay_nonuniform_timestamps():
    """Decay estimates under dropped/non-uniform frame times exercise
    the scalar fallback (chain breaks, gap > 1s resets)."""
    s = _settings(16)
    s.set("track_speed_decay", 0.7)
    bg, frames = _synth(30, 16, 224, seed=3)
    tracker = Tracker(s, background=bg)
    eng = FastTracker(s, background=bg)
    # irregular times incl. a >1s stall at frame 12 (resets chains)
    rng = np.random.default_rng(0)
    times = np.cumsum(rng.uniform(0.02, 0.08, len(frames)))
    times[12:] += 1.2
    for i, f in enumerate(frames):
        pp = tracker.preprocess_frame(i, detect_frame(f, bg, s),
                                      time=float(times[i]))
        tracker.add(pp)
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=bool(s["detect_threshold_is_absolute"]),
            track_threshold=20, track_absolute=False)
        eng.add_frame(i, float(times[i]), **raw)
    assert _tracker_assignments(tracker, len(frames)) \
        == _engine_assignments(eng)


def test_engine_drops_tag_blobs_like_host():
    """tags_dont_track parity: the fast engine must drop
    is_tag-flagged blobs exactly like the host prefilter
    (Tracker.cpp:776) — a tag blob must not claim an identity."""
    import numpy as np

    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.engine import FastTracker

    s = _settings(2)
    bg = np.full((128, 128), 200, np.uint8)
    eng = FastTracker(s, bg)

    def blob(x, flags=0):
        lines = np.array([[40 + r, x, x + 7] for r in range(6)],
                         np.int32)
        return TrackBlob(lines, np.full(48, 60, np.uint8),
                         flags=flags)

    for f in range(4):
        eng.add_frame_blobs(f, f / 25.0,
                            [blob(20 + f), blob(90 + f, flags=0x2)])
    assert eng.n_fish == 1  # the tag blob never tracked
    s2 = _settings(2)
    s2.set("tags_dont_track", False)
    eng2 = FastTracker(s2, bg)
    for f in range(4):
        eng2.add_frame_blobs(f, f / 25.0,
                             [blob(20 + f), blob(90 + f, flags=0x2)])
    assert eng2.n_fish == 2  # tags track when the drop is disabled
