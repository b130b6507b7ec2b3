"""Export side-products (`output_*` params) and the newly wired
headless parameters (ui/Export.cpp:479-900; default_config docs)."""
import numpy as np
import pytest

from test_engine import _settings, _synth

from trex_tpu.ops.labeling import label_blobs_raw
from trex_tpu.track.engine import FastTracker


def _tracked_engine(n_fish=12, posture=True, frames_n=25, seed=6,
                    size=224):
    s = _settings(n_fish)
    if posture:
        s.set("calculate_posture", True)
        s.set("outline_resample", 0.5)
    bg, frames = _synth(frames_n, n_fish, size, seed)
    eng = FastTracker(s, background=bg, keep_individuals=True)
    for i, f in enumerate(frames):
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=False, track_threshold=int(s["track_threshold"]),
            track_absolute=False)
        eng.add_frame(i, i / 25.0, **raw)
    return s, eng


def test_export_statistics_and_memory(tmp_path):
    from trex_tpu.export.export import export_statistics

    s, eng = _tracked_engine(posture=False)
    s.set("auto_no_memory_stats", False)  # default True skips memory
    paths = export_statistics(eng, s, tmp_path, "v")
    names = [p.name for p in paths]
    assert "v_statistics.npz" in names and "v_memory.npz" in names
    d = np.load(tmp_path / "v_statistics.npz")
    assert d["stats"].shape[1] == 16  # track::Statistics layout
    assert len(d["frames"]) == len(eng.statistics)
    # measured columns are finite, unmeasured stay inf (reference init)
    assert np.isfinite(d["stats"][:, 2]).all()   # number_fish
    assert np.isinf(d["stats"][:, 5]).all()      # match_number_fish
    m = np.load(tmp_path / "v_memory.npz")
    assert m["id"][0] == -1 and len(m["id"]) == len(eng.individuals) + 1


def test_export_recognition(tmp_path):
    from trex_tpu.export.export import export_recognition

    s, eng = _tracked_engine(posture=False)
    # synthesize VI predictions for a few (frame, blob) pairs
    rng = np.random.default_rng(0)
    n_written = 0
    for f in (3, 4, 5):
        per = {}
        fids, blobs = eng.frame_archive[f]
        for b in blobs[:4]:
            per[b.blob_id] = rng.random(10).astype(np.float32)
            n_written += 1
        eng.predicted[f] = per
    paths = export_recognition(eng, s, tmp_path, "v")
    assert paths
    total = 0
    for p in paths:
        d = np.load(p)
        assert d["probs"].shape[1] == 10
        assert len(d["frames"]) == len(d["probs"])
        total += len(d["frames"])
    assert total == n_written


def test_export_tracklet_images(tmp_path):
    from trex_tpu.export.export import export_tracklet_images

    s, eng = _tracked_engine(posture=True)
    s.set("output_min_frames", 5)
    s.set("tracklet_max_images", 8)
    paths = export_tracklet_images(eng, s, tmp_path, "v")
    d = np.load(tmp_path / "v_tracklet_images.npz")
    size = s["individual_image_size"]
    assert d["images"].shape[1:] == (int(size[1]), int(size[0]))
    assert len(d["images"]) == len(d["meta"])
    assert len(d["images"]) > 0
    # meta rows are (id, start, end) of tracklets long enough
    assert (d["meta"][:, 2] - d["meta"][:, 1] + 1 >= 5).all()
    # singles part written when tracklet_max_images == 0
    s.set("tracklet_max_images", 0)
    paths = export_tracklet_images(eng, s, tmp_path, "v0")
    d = np.load(tmp_path / "v0_tracklet_images_single_part0.npz")
    assert len(d["images"]) == len(d["frames"]) == len(d["ids"])
    assert len(d["images"]) > len(np.load(
        tmp_path / "v0_tracklet_images.npz")["images"])


def test_cli_export_all_side_products(tmp_path):
    """CLI convert with every output_* flag on produces the files."""
    import cv2

    from test_engine import _synth

    from trex_tpu.cli.trex import main

    bg, frames = _synth(20, 8, 200, seed=2)
    src = tmp_path / "vid"
    src.mkdir()
    for i, fr in enumerate(frames):
        cv2.imwrite(str(src / f"f_{i:03d}.jpg"), fr,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
    out = tmp_path / "out"
    rc = main(["-i", str(src / "f_%03d.jpg"), "-o", "vid",
               "-d", str(out), "-task", "convert", "-nowindow",
               "-auto_quit",
               "-track_max_individuals", "8",
               "-track_threshold", "20",
               "-track_max_speed", "300",
               "-track_size_filter", "[[20,400]]",
               "-detect_threshold", "15",
               "-average_samples", "5",
               "-meta_encoding", "gray",
               "-calculate_posture", "true",
               "-outline_resample", "0.5",
               "-output_posture_data", "true",
               "-output_statistics", "true",
               "-output_heatmaps", "true",
               "-output_tracklet_images", "true",
               "-output_visual_fields", "true",
               "-output_recognition_data", "true"])
    assert rc == 0
    data = out / "data"
    names = {p.name for p in data.iterdir()}
    assert "vid_statistics.npz" in names
    # auto_no_memory_stats defaults true -> no memory npz
    assert "vid_memory.npz" not in names
    assert "vid_tracklet_images.npz" in names
    assert any(n.startswith("vid_heatmap_") for n in names), names
    assert any(n.startswith("vid_posture_") for n in names)
    assert any(n.startswith("vid_visual_field_") for n in names), names


def test_analysis_range_limits_tracking(tmp_path):
    import cv2

    from trex_tpu.cli.trex import main
    from trex_tpu.config import reset_global_settings
    from trex_tpu.pipeline import TrackingState

    bg, frames = _synth(30, 6, 200, seed=3)
    src = tmp_path / "vid"
    src.mkdir()
    for i, fr in enumerate(frames):
        cv2.imwrite(str(src / f"f_{i:03d}.jpg"), fr,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
    out = tmp_path / "out"
    rc = main(["-i", str(src / "f_%03d.jpg"), "-o", "vid",
               "-d", str(out), "-task", "convert", "-nowindow",
               "-track_max_individuals", "6",
               "-track_threshold", "20", "-track_max_speed", "300",
               "-track_size_filter", "[[20,400]]",
               "-detect_threshold", "15", "-average_samples", "5",
               "-meta_encoding", "gray",
               "-calculate_posture", "false"])
    assert rc == 0
    s = reset_global_settings()
    s.set("analysis_range", [5, 14])
    s.set("track_max_individuals", 6)
    s.set("track_threshold", 20)
    s.set("track_max_speed", 300)
    s.set("track_size_filter", [[20, 400]])
    s.set("calculate_posture", False)
    st = TrackingState(s, out / "vid.pv")
    tr = st.run()
    assert tr.start_frame == 5 and tr.end_frame == 14


def test_filter_blobs_by_prediction():
    from trex_tpu.config import reset_global_settings
    from trex_tpu.pipeline import filter_blobs_by_prediction
    from trex_tpu.track.blob import TrackBlob

    def blob(pred):
        b = TrackBlob(np.array([[0, 0, 3]], np.int32),
                      np.zeros(4, np.uint8))
        b.prediction = pred
        return b

    s = reset_global_settings()
    blobs = [
        blob(None),
        blob({"clid": 0, "p": 0.05, "original_outline": None}),
        blob({"clid": 1, "p": 0.9,
              "original_outline": np.zeros((4, 2))}),
        blob({"clid": 2, "p": 0.8, "original_outline": None}),
    ]
    s.set("track_conf_threshold", 0.1)
    out = filter_blobs_by_prediction(blobs, s)
    assert len(out) == 3  # low-confidence dropped, no-pred kept
    s.set("track_only_classes", [1])
    out = filter_blobs_by_prediction(blobs, s)
    assert len(out) == 2  # no-pred + class 1
    s.set("track_only_classes", [])
    s.set("track_only_segmentations", True)
    out = filter_blobs_by_prediction(blobs, s)
    assert len(out) == 2  # no-pred + the outline-carrying one


def test_output_normalize_midline_data(tmp_path):
    """output_normalize_midline_data: posture NPZ carries the
    canonical-pose fixed-scale midline (Individual::fixed_midline) —
    tail at the origin, chord on +x, total length = the individual's
    median midline length — instead of raw blob-local segments."""
    from tests.test_library_fields import _two_fish_tracker
    from trex_tpu.export.export import export_posture

    tracker, s = _two_fish_tracker(n_frames=12)
    p_raw = export_posture(tracker, s, tmp_path / "raw", "v")
    s.set("output_normalize_midline_data", True)
    p_norm = export_posture(tracker, s, tmp_path / "norm", "v")
    assert p_raw and p_norm

    raw = np.load(p_raw[0])
    norm = np.load(p_norm[0])
    res = int(s["midline_resolution"] or 25)
    # normalized export resamples every midline to midline_resolution
    assert set(norm["midline_lengths_points"].tolist()) <= {0, res}
    k = int(norm["midline_lengths_points"][0])
    if k:
        pts = norm["midline_points"][:k]
        # tail at the origin
        np.testing.assert_allclose(pts[-1], [0, 0], atol=1e-4)
        # chord along +x
        assert abs(pts[0][1]) < 1e-3 and pts[0][0] > 0
        # arc length pinned to the individual's median midline length
        lengths = [q for q in raw["midline_lengths"] if np.isfinite(q)]
        want = float(np.median(lengths))
        d = float(np.hypot(*np.diff(pts, axis=0).T).sum())
        assert d == pytest.approx(want, rel=1e-3)
    # raw export unchanged
    assert raw["midline_points"].shape != norm["midline_points"].shape \
        or not np.allclose(raw["midline_points"], norm["midline_points"])


def test_posture_direction_smoothing_votes(tmp_path):
    """posture_direction_smoothing > 1 averages midline-angle unit
    vectors over the window (Individual::calculate_previous_vector,
    Individual.cpp:2296-2349): one flipped outlier cannot flip the
    direction vote."""
    from trex_tpu.track.individual import Individual, PostureStuff

    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    ind = Individual(0, s)
    # 4 frames pointing +x, one outlier pointing -x
    from trex_tpu.track.posture import Midline

    for f, a in enumerate([0.0, 0.0, np.pi, 0.0, 0.0]):
        m = Midline(segments=np.array([[0, 0], [1, 0.0]]))
        ind.add_posture(PostureStuff(frame=f, midline=m,
                                     midline_angle=a))
    v = ind.calculate_previous_vector(5, 5)
    assert v is not None
    assert v[0] > 0.99 and abs(v[1]) < 1e-6  # majority +x wins
    # window of 1 sees only the last frame
    v1 = ind.calculate_previous_vector(3, 1)
    assert v1[0] < -0.99  # frame 2 outlier
    # no posture -> None
    ind2 = Individual(1, s)
    assert ind2.calculate_previous_vector(5, 5) is None


def test_data_prefix_export_subfolder(tmp_path):
    """data_prefix: exports land under <output>/<data_prefix> instead
    of the default 'data' (Export.cpp:189 DataLocation::parse)."""
    import subprocess
    import sys
    from pathlib import Path

    frames = Path("/root/reference/videos/test_frames")
    if not frames.exists():
        import pytest

        pytest.skip("fixture not available")
    env = None
    r = subprocess.run(
        [sys.executable, "-m", "trex_tpu.cli.trex",
         "-i", str(frames / "frame_%3d.jpg"), "-o", "t",
         "-d", str(tmp_path), "-s",
         "/root/reference/videos/test.settings",
         "-task", "convert", "-nowindow", "-auto_quit",
         "-video_conversion_range", "[0,6]",
         "-data_prefix", "fishdata"],
        capture_output=True, text=True, timeout=560, env=env)
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "fishdata").is_dir(), r.stdout[-400:]
    assert list((tmp_path / "fishdata").glob("t_fish*.csv"))
    assert not (tmp_path / "data").exists()
