"""Archive-mode parity: FastTracker(keep_individuals=True) must feed
the FULL product export surface (per-fish CSV/NPZ, posture NPZ,
.results) with byte-identical artifacts to the object Tracker on the
same frames — the engines ARE the product path, not a reduced one
(reference: ui/Export.cpp:156-700, tracking/Output.h:224-228)."""
import concurrent.futures as cf

import numpy as np
import pytest

from test_engine import _settings, _synth, _tracker_assignments

from trex_tpu.ops.labeling import label_blobs_raw
from trex_tpu.pipeline import detect_frame, run_postures
from trex_tpu.track import Tracker
from trex_tpu.track.engine import FastTracker


def _drive_pair(s, bg, frames, times=None):
    """Run object Tracker (+ run_postures) and archived FastTracker
    over the same frames; returns (tracker, engine)."""
    tracker = Tracker(s, background=bg)
    eng = FastTracker(s, background=bg, keep_individuals=True)
    posture = bool(s["calculate_posture"])
    for i, f in enumerate(frames):
        t = times[i] if times is not None else i / 25.0
        pp = tracker.preprocess_frame(i, detect_frame(f, bg, s), time=t)
        tracker.add(pp)
        if posture:
            run_postures(tracker, i, s, None)
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=bool(s["detect_threshold_is_absolute"]),
            track_threshold=int(s["track_threshold"]),
            track_absolute=bool(s["track_threshold_is_absolute"]))
        eng.add_frame(i, t, **raw)
    return tracker, eng


def _assert_individuals_equal(tracker, eng, check_angle=True):
    assert sorted(tracker.individuals) == sorted(eng.individuals)
    for fid, ind in tracker.individuals.items():
        e = eng.individuals[fid]
        assert [b.frame for b in ind.basic] == [b.frame for b in e.basic]
        for a, b in zip(ind.basic, e.basic):
            assert a.centroid.x == b.centroid.x
            assert a.centroid.y == b.centroid.y
            assert a.centroid.vx == b.centroid.vx
            assert a.blob.blob_id == b.blob.blob_id
            assert a.blob.num_pixels == b.blob.num_pixels
            assert a.blob.split == b.blob.split
            np.testing.assert_array_equal(a.blob.lines, b.blob.lines)
            if a.blob.pixels is not None:
                # crops/tracklet-image consumers read blob pixels
                np.testing.assert_array_equal(a.blob.pixels,
                                              b.blob.pixels)
            if check_angle:
                assert a.centroid.angle == b.centroid.angle
        assert ind.tracklets == e.tracklets


@pytest.mark.parametrize("n_fish,size,seed,decay", [
    (32, 256, 1, 1.0), (48, 320, 2, 0.7)])
def test_archive_individuals_equal_object_tracker(n_fish, size, seed,
                                                  decay):
    s = _settings(n_fish)
    s.set("track_speed_decay", decay)
    bg, frames = _synth(40, n_fish, size, seed)
    tracker, eng = _drive_pair(s, bg, frames)
    assert _tracker_assignments(tracker, len(frames)) is not None
    _assert_individuals_equal(tracker, eng)


def test_archive_posture_equal_object_tracker():
    s = _settings(24)
    s.set("calculate_posture", True)
    s.set("outline_resample", 0.5)
    s.set("track_speed_decay", 0.7)
    bg, frames = _synth(30, 24, 256, 4)
    tracker, eng = _drive_pair(s, bg, frames)
    _assert_individuals_equal(tracker, eng)
    n_post = 0
    for fid, ind in tracker.individuals.items():
        e = eng.individuals[fid]
        assert [p.frame for p in ind.posture] \
            == [p.frame for p in e.posture]
        for a, b in zip(ind.posture, e.posture):
            assert (a.midline is None) == (b.midline is None)
            if a.outline is not None:
                np.testing.assert_array_equal(a.outline, b.outline)
            if a.midline is None:
                continue
            n_post += 1
            np.testing.assert_array_equal(a.midline.segments,
                                          b.midline.segments)
            np.testing.assert_array_equal(a.midline.heights,
                                          b.midline.heights)
            assert a.midline.len == b.midline.len
            assert a.midline.angle == b.midline.angle
            assert a.midline.offset == b.midline.offset
            assert a.midline.tail_index == b.midline.tail_index
            assert a.midline_length == b.midline_length
            assert a.head.x == b.head.x and a.head.y == b.head.y
            assert a.head.vx == b.head.vx
            assert a.centroid_posture.x == b.centroid_posture.x
    assert n_post > 50


def test_archive_export_files_byte_equal(tmp_path):
    """export_data + export_posture + save_results produce byte-equal
    artifacts from either engine."""
    from trex_tpu.export.export import export_data, export_posture
    from trex_tpu.export.results import save_results

    s = _settings(16)
    s.set("calculate_posture", True)
    s.set("output_posture_data", True)
    s.set("output_fields", [["X", ["wcentroid"]], ["Y", ["wcentroid"]],
                            ["SPEED", ["wcentroid"]], ["ANGLE", []],
                            ["midline_length", ["RAW"]],
                            ["num_pixels", ["RAW"]], ["blobid", []]])
    bg, frames = _synth(25, 16, 224, 6)
    tracker, eng = _drive_pair(s, bg, frames)
    d1 = tmp_path / "obj"
    d2 = tmp_path / "eng"
    p1 = export_data(tracker, s, d1, "v") \
        + export_posture(tracker, s, d1, "v") \
        + [save_results(tracker, s, d1 / "v.results")]
    p2 = export_data(eng, s, d2, "v") \
        + export_posture(eng, s, d2, "v") \
        + [save_results(eng, s, d2 / "v.results")]
    assert [p.name for p in p1] == [p.name for p in p2]
    for a, b in zip(p1, p2):
        if a.suffix == ".npz":
            da, db = np.load(a), np.load(b)
            assert sorted(da.files) == sorted(db.files)
            for k in da.files:
                np.testing.assert_array_equal(da[k], db[k],
                                              err_msg=f"{a.name}:{k}")
        else:
            assert a.read_bytes() == b.read_bytes(), a.name


def test_archive_off_keeps_positional_surface():
    s = _settings(8)
    bg, frames = _synth(5, 8, 128, 0)
    eng = FastTracker(s, background=bg)
    for i, f in enumerate(frames):
        raw = label_blobs_raw(
            f, bg, threshold=int(s["detect_threshold"]),
            absolute=False, track_threshold=int(s["track_threshold"]),
            track_absolute=False)
        eng.add_frame(i, i / 25.0, **raw)
    assert not hasattr(eng, "individuals")
    assert eng.history


def test_device_archive_export_equal_object_tracker(tmp_path):
    """DeviceTracker(keep_individuals=True) on the blob path produces
    the same per-individual archives + export files as the object
    Tracker (committed device frames archive from the host tables via
    fish_row; assist frames via the helper engine)."""
    from trex_tpu.export.export import export_data, export_posture
    from trex_tpu.track.device_engine import DeviceTracker

    s = _settings(24)
    s.set("calculate_posture", True)
    s.set("outline_resample", 0.5)
    bg, frames = _synth(30, 24, 256, 4)
    tracker = Tracker(s, background=bg)
    dev = DeviceTracker(s, bg, chunk=8, keep_individuals=True)
    for i, f in enumerate(frames):
        blobs = detect_frame(f, bg, s)
        pp = tracker.preprocess_frame(i, blobs, time=i / 25.0)
        tracker.add(pp)
        run_postures(tracker, i, s, None)
        dev.add_frame_blobs(i, i / 25.0, detect_frame(f, bg, s))
    dev.finalize()
    _assert_individuals_equal(tracker, dev)
    d1 = tmp_path / "obj"
    d2 = tmp_path / "dev"
    p1 = export_data(tracker, s, d1, "v") \
        + export_posture(tracker, s, d1, "v")
    p2 = export_data(dev, s, d2, "v") + export_posture(dev, s, d2, "v")
    assert [p.name for p in p1] == [p.name for p in p2]
    for a, b in zip(p1, p2):
        if a.suffix == ".npz":
            da, db = np.load(a), np.load(b)
            for k in da.files:
                np.testing.assert_array_equal(da[k], db[k],
                                              err_msg=f"{a.name}:{k}")
        else:
            assert a.read_bytes() == b.read_bytes(), a.name
