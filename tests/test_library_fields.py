"""Output::Library field-for-field parity.

The reference registers ~46 named field functions
(tracking/OutputLibrary.cpp; user-facing table docs/formats.rst:18-78).
This file pins (a) the full registry — every reference field name must
resolve — and (b) the semantics of the round-5 additions (events
family, blob geometry, detection columns, group fields, qr_p).
"""
import math

import numpy as np
import pytest

from trex_tpu.config import reset_global_settings
from trex_tpu.export.library import (CENTROID_ONLY, FUNCTIONS, INVALID,
                                     EvalContext, evaluate)
from trex_tpu.track import TrackBlob, Tracker

# every field registered by the reference's Library::init (quoted keys
# of _cache_func in OutputLibrary.cpp, plus the macro-registered motion
# family), minus GUI-only "bone"/"pose" plotting hooks
REFERENCE_FIELDS = [
    "X", "Y", "VX", "VY", "AX", "AY", "SPEED", "ACCELERATION", "ANGLE",
    "ANGULAR_V", "ANGULAR_A", "BORDER_DISTANCE", "NEIGHBOR_DISTANCE",
    "NEIGHBOR_VECTOR_T", "DOT_V", "L_V", "RELATIVE_ANGLE",
    "MIDLINE_OFFSET", "normalized_midline", "midline_length",
    "midline_x", "midline_y", "midline_segment_length", "outline_size",
    "outline_std", "amplitude", "variance", "sqrt_a",
    "events", "event_energy", "event_acceleration",
    "event_direction_change", "tailbeat_threshold", "tailbeat_peak",
    "threshold_reached", "v_direction",
    "blobid", "blob_x", "blob_y", "blob_width", "blob_height",
    "num_pixels", "pixels_squared",
    "detection_class", "detection_p", "visual_identification_p",
    "category", "average_category", "qr_id", "qr_p",
    "tracklet_id", "tracklet_length", "consecutive",
    "global", "compactness",
    "missing", "time", "timestamp", "frame",
]


def _two_fish_tracker(n_frames=30, posture=True):
    s = reset_global_settings()
    s.set("track_max_individuals", 2)
    s.set("track_threshold", 10)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_max_speed", 800)
    if posture:
        s.set("calculate_posture", True)
        s.set("track_posture_threshold", 8)
    bg = np.full((128, 128), 200, np.uint8)
    tracker = Tracker(s, background=bg)
    for f in range(n_frames):
        blobs = []
        for k, y0 in enumerate((20, 80)):
            x0 = 10 + f * 2 + k * 10
            # elongated 6x16 fish-like blob
            lines = np.stack([np.arange(y0, y0 + 6), np.full(6, x0),
                              np.full(6, x0 + 15)], 1).astype(np.int32)
            px = np.full(6 * 16, 60, np.uint8)
            blobs.append(TrackBlob(lines, px))
        pp = tracker.preprocess_frame(f, blobs, time=f / 25.0)
        tracker.add(pp)
        if posture:
            from trex_tpu.pipeline import run_postures

            run_postures(tracker, f, s, None)
    return tracker, s


@pytest.fixture(scope="module")
def tracked():
    tracker, s = _two_fish_tracker()
    tracker.tag_assignments[5] = {0: 7}
    tracker.tag_assignment_p[5] = {0: 0.875}
    ind = tracker.individuals[0]
    b = ind.basic_stuff(5)
    b.blob.prediction = {"clid": 3, "p": 0.5}
    return tracker, s, ind


def test_every_reference_field_registered():
    missing = [f for f in REFERENCE_FIELDS
               if f not in FUNCTIONS and not f.startswith("pose")]
    assert not missing, f"unregistered reference fields: {missing}"


def test_every_field_evaluates(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    for field in REFERENCE_FIELDS:
        for mods in ([], ["wcentroid"], ["SMOOTH"]):
            v = evaluate(ctx, ind, 10, field, mods)
            assert isinstance(v, float), (field, mods)


def test_blob_geometry_fields(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    b = ind.basic_stuff(10)
    x, y, w, h = b.blob.bounds
    assert evaluate(ctx, ind, 10, "blob_x", []) == float(x)
    assert evaluate(ctx, ind, 10, "blob_y", []) == float(y)
    assert evaluate(ctx, ind, 10, "blob_width", []) == float(w)
    assert evaluate(ctx, ind, 10, "blob_height", []) == float(h)
    assert evaluate(ctx, ind, 10, "pixels_squared", []) == float(w * h)


def test_threshold_constants_and_event_defaults(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    assert evaluate(ctx, ind, 10, "tailbeat_threshold", []) == \
        pytest.approx(float(s["limit"]))
    assert evaluate(ctx, ind, 10, "tailbeat_peak", []) == \
        pytest.approx(float(s["event_min_peak_offset"]))
    # straight-swimming synthetic fish: no tailbeat events — the events
    # family returns 0, NOT invalid (OutputLibrary.cpp:730-781)
    assert evaluate(ctx, ind, 10, "events", []) == 0.0
    assert evaluate(ctx, ind, 10, "event_energy", []) == 0.0
    assert evaluate(ctx, ind, 10, "event_acceleration", []) == 0.0
    assert evaluate(ctx, ind, 10, "v_direction", []) == 0.0


def test_detection_and_qr_fields(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    assert evaluate(ctx, ind, 5, "detection_class", []) == 3.0
    assert evaluate(ctx, ind, 5, "detection_p", []) == 0.5
    assert evaluate(ctx, ind, 10, "detection_class", []) == INVALID
    assert evaluate(ctx, ind, 5, "qr_id", []) == 7.0
    assert evaluate(ctx, ind, 5, "qr_p", []) == 0.875
    assert evaluate(ctx, ind, 10, "qr_p", []) == INVALID


def test_group_fields_two_fish(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    g = evaluate(ctx, ind, 10, "global", ["wcentroid"])
    c = evaluate(ctx, ind, 10, "compactness", ["wcentroid"])
    # mean of the two centroids, |mean| > 0; compactness = 2/sum(d)
    assert math.isfinite(g) and g > 0
    assert math.isfinite(c) and c > 0
    r0 = ind.basic_stuff(10).centroid
    r1 = tracker.individuals[1].basic_stuff(10).centroid
    mx, my = (r0.x + r1.x) / 2, (r0.y + r1.y) / 2
    assert g == pytest.approx(math.hypot(mx, my))
    dsum = math.hypot(mx - r0.x, my - r0.y) + math.hypot(mx - r1.x,
                                                         my - r1.y)
    assert c == pytest.approx(2 / dsum)


def test_pairwise_fields_finite(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    assert math.isfinite(evaluate(ctx, ind, 10, "L_V", ["wcentroid"]))
    assert math.isfinite(
        evaluate(ctx, ind, 10, "RELATIVE_ANGLE", ["wcentroid"]))
    # both fish move horizontally at the same speed: identical velocity
    # directions, DOT_V = 0
    assert evaluate(ctx, ind, 10, "DOT_V", ["wcentroid"]) == \
        pytest.approx(0.0, abs=1e-5)
    # same velocities => zero velocity-space distance
    assert evaluate(ctx, ind, 10, "L_V", ["wcentroid"]) == \
        pytest.approx(0.0, abs=1e-5)


def test_tracklet_length_matches_consecutive(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    tl = evaluate(ctx, ind, 10, "tracklet_length", [])
    assert tl == evaluate(ctx, ind, 10, "consecutive", [])
    assert tl == 30.0  # one unbroken 30-frame tracklet


def test_midline_xy_uses_blob_origin_plus_offset(tracked):
    tracker, s, ind = tracked
    ctx = EvalContext(tracker, s)
    p = ind.posture_stuff(10)
    if p is None or p.midline is None or not len(p.midline.segments):
        pytest.skip("no posture on this fixture")
    b = ind.basic_stuff(10)
    expect_x = float(b.blob.bounds[0]) + float(p.midline.offset[0])
    assert evaluate(ctx, ind, 10, "midline_x", []) == \
        pytest.approx(expect_x)


def test_new_fields_have_no_source_suffix():
    from trex_tpu.export.library import column_title

    for f in ("events", "blob_x", "detection_p", "qr_p", "variance",
              "outline_std", "tracklet_length", "threshold_reached"):
        assert "#" not in column_title(f, ["wcentroid"], {}), f
    assert CENTROID_ONLY.issuperset({"events", "blob_x", "qr_p"})


def test_output_centered_and_origin(tracked):
    """output_centered subtracts half the video size (in cm) from X/Y;
    output_origin subtracts a user origin; VX and SPEED are
    translation-invariant (OutputLibrary.cpp:230-285)."""
    tracker, s, ind = tracked
    ctx0 = EvalContext(tracker, s)
    x0 = evaluate(ctx0, ind, 10, "X", [])
    y0 = evaluate(ctx0, ind, 10, "Y", [])
    vx0 = evaluate(ctx0, ind, 10, "VX", [])

    s.set("output_centered", True)
    ctx1 = EvalContext(tracker, s)  # background is 128x128
    assert evaluate(ctx1, ind, 10, "X", []) == pytest.approx(x0 - 64.0)
    assert evaluate(ctx1, ind, 10, "Y", []) == pytest.approx(y0 - 64.0)
    assert evaluate(ctx1, ind, 10, "VX", []) == pytest.approx(vx0)

    s.set("output_centered", False)
    s.set("output_origin", [10.0, 20.0])
    ctx2 = EvalContext(tracker, s)
    assert evaluate(ctx2, ind, 10, "X", []) == pytest.approx(x0 - 10.0)
    assert evaluate(ctx2, ind, 10, "Y", []) == pytest.approx(y0 - 20.0)
    s.set("output_origin", [0.0, 0.0])


def test_output_auto_pose_and_detection_fields(tmp_path, tracked):
    """With detect_classes set, exports auto-append detection_p
    (output_auto_detection_fields) and keypoint columns named from
    detect_keypoint_names (else poseX<i>/poseY<i>) — Export.cpp:
    225-258 + default_config.cpp add_missing_pose_fields."""
    import csv

    from trex_tpu.export.export import export_data

    tracker, s, ind = tracked
    # attach a 2-point pose to one blob
    b = ind.basic_stuff(5)
    b.blob.prediction = {"clid": 3, "p": 0.5,
                         "keypoints": np.array([[11.0, 22.0],
                                                [33.0, 44.0]])}
    s.set("output_fields", [["X", ["wcentroid"]]])
    s.set("detect_classes", {0: "fish"})
    s.set("detect_keypoint_format", [2, 2])
    s.set("output_format", "csv")
    export_data(tracker, s, tmp_path, "v")
    with open(tmp_path / "v_id0.csv") as f:
        header = next(csv.reader(f))
    assert "detection_p" in header
    assert any(h.startswith("poseX0") for h in header), header
    assert any(h.startswith("poseY1") for h in header), header

    # named keypoints replace the generic columns
    s.set("detect_keypoint_names", ["head", "tail"])
    export_data(tracker, s, tmp_path / "named", "v")
    with open(tmp_path / "named" / "v_id0.csv") as f:
        header = next(csv.reader(f))
    assert any(h.startswith("head_X") for h in header), header
    assert any(h.startswith("tail_Y") for h in header), header
    # named columns evaluate through the pose index
    rows = list(csv.reader(open(tmp_path / "named" / "v_id0.csv")))
    hx = [h.split(" ")[0] for h in rows[0]].index("head_X")
    frame5 = [r for r in rows[1:] if float(r[0]) == 5][0]
    assert float(frame5[hx]) == pytest.approx(11.0)

    # switches off
    s.set("output_auto_pose", False)
    s.set("output_auto_detection_fields", False)
    export_data(tracker, s, tmp_path / "off", "v")
    with open(tmp_path / "off" / "v_id0.csv") as f:
        header = next(csv.reader(f))
    assert "detection_p" not in header
    assert not any(h.startswith("poseX") for h in header)
