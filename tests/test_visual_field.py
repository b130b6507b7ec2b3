"""Visual-field kernel tests (reference VisualField semantics:
512 bins, 130-deg symmetric FOV, 2 layers, fov falloff (1-d/max_d)^2)."""
import math

import numpy as np
import pytest

from trex_tpu.ops.raycast import FIELD_RESOLUTION, visual_field
from trex_tpu.track.visual_field import tesselate_outline


def _square(cx, cy, r=5.0, n=40):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(t), cy + r * np.sin(t)], 1).astype(np.float32)


def test_single_object_straight_ahead():
    # one eye at origin looking +x; a target circle at (100, 0)
    target = _square(100, 0, r=5)
    pts = target
    ids = np.full(len(pts), 7, np.int32)
    valid = np.ones(len(pts), bool)
    eye_pos = np.zeros((1, 2, 2), np.float32)
    eye_angle = np.zeros((1, 2), np.float32)
    out = visual_field(pts, ids, valid, eye_pos, eye_angle,
                       np.float32(1000.0))
    d0 = np.asarray(out["depth0"])[0, 0]
    i0 = np.asarray(out["id0"])[0, 0]
    mid = FIELD_RESOLUTION // 2
    # nearest point of the circle is at distance 95 straight ahead
    assert d0[mid] == pytest.approx(95.0, abs=1.0)
    assert i0[mid] == 7
    # bins far outside the target's angular extent are empty
    assert i0[5] == -1 and i0[-5] == -1
    fov0 = np.asarray(out["fov0"])[0, 0]
    # VisualField.cpp fov: (1 - (dist/diag)^2)^2 * 255 (the
    # reference works in squared distances)
    expect = (1 - (95.0 / 1000.0) ** 2) ** 2 * 255
    assert abs(int(fov0[mid]) - int(expect)) <= 3


def test_occlusion_two_layers():
    near = _square(50, 0, r=5)
    far = _square(120, 0, r=5)
    pts = np.concatenate([near, far])
    ids = np.concatenate([np.full(len(near), 1), np.full(len(far), 2)]) \
        .astype(np.int32)
    valid = np.ones(len(pts), bool)
    eye_pos = np.zeros((1, 2, 2), np.float32)
    eye_angle = np.zeros((1, 2), np.float32)
    out = visual_field(pts, ids, valid, eye_pos, eye_angle, np.float32(1000.0))
    mid = FIELD_RESOLUTION // 2
    assert np.asarray(out["id0"])[0, 0, mid] == 1  # near wins layer 0
    assert np.asarray(out["id1"])[0, 0, mid] == 2  # far shows in layer 1
    assert np.asarray(out["depth1"])[0, 0, mid] > \
        np.asarray(out["depth0"])[0, 0, mid]


def test_fov_limits():
    # object behind the eye is invisible
    behind = _square(-100, 0, r=5)
    ids = np.zeros(len(behind), np.int32)
    valid = np.ones(len(behind), bool)
    eye_pos = np.zeros((1, 2, 2), np.float32)
    eye_angle = np.zeros((1, 2), np.float32)
    out = visual_field(behind, ids, valid, eye_pos, eye_angle,
                       np.float32(1000.0))
    assert (np.asarray(out["id0"])[0] == -1).all()


def test_tesselate_outline_spacing():
    sq = np.array([[0, 0], [20, 0], [20, 20], [0, 20]], np.float32)
    t = tesselate_outline(sq, 5.0)
    d = np.hypot(*np.diff(np.vstack([t, t[:1]]), axis=0).T)
    assert d.max() <= 5.0 + 1e-5
    assert len(t) >= 16


def test_e2e_visual_fields_on_fixture(tmp_path):
    from pathlib import Path

    if not Path("/root/reference/videos/test_frames").exists():
        pytest.skip("fixture not available")
    from tests.test_e2e import _convert_range
    from trex_tpu.track.visual_field import compute_visual_fields

    tracker, s = _convert_range(tmp_path, 5)
    res = compute_visual_fields(tracker, 2, s)
    assert res is not None
    ids, fields = res
    assert len(ids) >= 6
    assert fields["depth0"].shape == (len(ids), 2, FIELD_RESOLUTION)
    # each fish should see at least one other fish somewhere
    seen = (fields["id0"] >= 0).any(axis=(1, 2))
    assert seen.mean() > 0.5


def test_visual_field_sparse_fish_ids():
    """Fish ids need not be 0..F-1: the raycast kernel works on
    positional indices and the id planes map back to real ids
    (regression: tracker ids were compared against positional eye
    indices, corrupting self/winner exclusion)."""
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.individual import (BasicStuff, Individual,
                                           PostureStuff)
    from trex_tpu.track.motion import MotionRecord
    from trex_tpu.track.posture import Midline
    from trex_tpu.track.visual_field import compute_visual_fields

    s = reset_global_settings()
    s.set("cm_per_pixel", 1.0)

    def make_ind(fid, cx, angle=math.pi):
        ind = Individual(fid, s)
        lines = np.array([[48 + r, cx - 4, cx + 4] for r in range(8)],
                         np.int32)
        blob = TrackBlob(lines, np.full(72, 80, np.uint8))
        rec = MotionRecord.create(None, 0.0, float(cx), 52.0, 0.0)
        ind._frames[0] = 0
        ind.basic.append(BasicStuff(frame=0, blob=blob, centroid=rec))
        # a small head-first horizontal midline + square outline
        segs = np.stack([np.linspace(cx + 3, cx - 3, 7),
                         np.full(7, 4.0)], axis=1)
        ml = Midline(segments=segs, heights=np.full(7, 4.0),
                     len=6.0, angle=angle)  # tail->head direction
        outline = np.array([[cx - 4, 48], [cx + 4, 48],
                            [cx + 4, 55], [cx - 4, 55]], np.float32)
        ind.add_posture(PostureStuff(frame=0, outline=outline,
                                     midline=ml))
        return ind

    class _T:
        pass

    tracker = _T()
    # fish 5 views +x (toward fish 9); fish 9 views -x (toward fish 5)
    tracker.individuals = {5: make_ind(5, 30, angle=math.pi),
                           9: make_ind(9, 70, angle=0.0)}
    tracker.background = np.full((100, 100), 200, np.uint8)

    res = compute_visual_fields(tracker, 0, s)
    assert res is not None
    ids, fields = res
    assert ids == [5, 9]
    seen0 = set(np.unique(fields["id0"]))
    # only real fish ids (or -1 for no hit) appear in the planes
    assert seen0 <= {-1, 5, 9}, seen0
    # each eye must not see its own id in layer 0 at near-zero depth
    # from its own body (self-exclusion happens per positional index):
    # fish 5's field should contain fish 9 somewhere (and vice versa)
    assert 9 in set(np.unique(fields["id0"][0]))
    assert 5 in set(np.unique(fields["id0"][1]))


def test_visual_field_shapes_occlude():
    """visual_field_shapes (VisualField.cpp:499-523): a user polygon
    between two fish blocks their line of sight; the blocking object
    appears in the id plane with the reference's pseudo-id
    (uint32_max - 42 - shape_index)."""
    from tests.test_visual_field import test_visual_field_sparse_fish_ids  # noqa
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.individual import (BasicStuff, Individual,
                                           PostureStuff)
    from trex_tpu.track.motion import MotionRecord
    from trex_tpu.track.posture import Midline
    from trex_tpu.track.visual_field import compute_visual_fields

    s = reset_global_settings()
    s.set("cm_per_pixel", 1.0)

    def make_ind(fid, cx, angle):
        ind = Individual(fid, s)
        lines = np.array([[48 + r, cx - 4, cx + 4] for r in range(8)],
                         np.int32)
        blob = TrackBlob(lines, np.full(72, 80, np.uint8))
        rec = MotionRecord.create(None, 0.0, float(cx), 52.0, 0.0)
        ind._frames[0] = 0
        ind.basic.append(BasicStuff(frame=0, blob=blob, centroid=rec))
        segs = np.stack([np.linspace(cx + 3, cx - 3, 7),
                         np.full(7, 4.0)], axis=1)
        ml = Midline(segments=segs, heights=np.full(7, 4.0),
                     len=6.0, angle=angle)
        outline = np.array([[cx - 4, 48], [cx + 4, 48],
                            [cx + 4, 55], [cx - 4, 55]], np.float32)
        ind.add_posture(PostureStuff(frame=0, outline=outline,
                                     midline=ml))
        return ind

    class _T:
        pass

    tracker = _T()
    tracker.individuals = {5: make_ind(5, 30, math.pi),
                           9: make_ind(9, 70, 0.0)}
    tracker.background = np.full((100, 100), 200, np.uint8)

    # without shapes the fish see each other
    res = compute_visual_fields(tracker, 0, s)
    bins_9_before = int((res[1]["id0"][0] == 9).sum())
    assert bins_9_before > 0

    # a tall wall between fish 5's eyes (x~58, synthetic midlines are
    # image-coords) and fish 9's outline (x 66-74)
    s.set("visual_field_shapes",
          [[[60, 0], [64, 0], [64, 100], [60, 100]]])
    res2 = compute_visual_fields(tracker, 0, s)
    ids, fields = res2
    pseudo = 4294967295 - 42
    plane = fields["id0"][0]
    wall_bins = plane == pseudo
    bins_9_after = int((plane == 9).sum())
    # the wall dominates fish 5's forward view: it claims more bins
    # than the other fish retains, and hides most of fish 9 (the
    # raycast is point-sampled, so a few angular pinholes remain)
    assert wall_bins.sum() > bins_9_after
    assert bins_9_after < bins_9_before / 2
    # the wall's nearest approach is close to the eye; oblique rays
    # run up/down the wall and report longer distances
    assert fields["depth0"][0][wall_bins].min() <= 25.0
