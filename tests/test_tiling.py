"""SAHI tiling + tile-merge tests, with golden vectors mirrored from the
reference's test_tiling.cpp (which captured them from real SAHI runs via
generate_sahi_references.py)."""
import numpy as np
import pytest

from trex_tpu.detect.tiling import (
    compute_offsets,
    compute_pose_tile_rect,
    compute_tile_bounds,
    compute_tile_merge_groups,
    compute_tile_nms_indices,
    compute_tiling_dimensions,
)


def _rows(rows):
    arr = np.array(rows, np.float32)
    return arr[:, :4], arr[:, 4], arr[:, 5].astype(int)


def test_tiling_dimensions_no_tiling():
    new, tile = compute_tiling_dimensions((1024, 768), (640, 640), 0, 0)
    assert new == (640, 640) and tile == (640, 640)


def test_tiling_dimensions_target_width():
    new, tile = compute_tiling_dimensions((1000, 500), (640, 640), 320, 0)
    assert tile == (320, 320)
    assert new == (320 * 4, 320 * 2)  # ceil(1000/320)=4, ceil(500/320)=2


def test_tiling_dimensions_tile_image_grid():
    new, tile = compute_tiling_dimensions((1000, 1000), (640, 640), 0, 2)
    assert tile == (640, 640)
    assert new == (1280, 1280)


def test_compute_offsets():
    assert compute_offsets(100, 200, 100) == [0]
    assert compute_offsets(640, 320, 320) == [0, 320]
    # stride smaller than tile (overlap): final offset clamps to extent-tile
    offs = compute_offsets(700, 320, 240)
    assert offs[0] == 0 and offs[-1] == 700 - 320
    for a, b in zip(offs, offs[1:]):
        assert b > a


def test_tile_bounds_cover_frame():
    tiles = compute_tile_bounds((1000, 600), (640, 640), 320, 0, 0.1)
    assert tiles
    xs = {t[0] for t in tiles}
    ys = {t[1] for t in tiles}
    assert max(x + 320 for x in xs) >= 1000
    assert max(y + 320 for y in ys) >= 600
    # no tiling requested -> empty
    assert compute_tile_bounds((1000, 600), (640, 640), 0, 0, 0.1) == []


# golden SAHI vectors (test_tiling.cpp:404-475)
def test_greedy_nmm_matches_sahi_four_way_overlap():
    boxes, conf, clid = _rows([
        (100, 100, 200, 200, 0.95, 1),
        (110, 100, 210, 200, 0.90, 1),
        (100, 110, 200, 210, 0.85, 1),
        (110, 110, 210, 210, 0.80, 1),
        (110, 110, 210, 210, 0.75, 2),
    ])
    groups = compute_tile_merge_groups(boxes, conf, clid, 0.5)
    assert len(groups) == 2
    assert groups[0].representative_index == 0
    assert groups[0].source_indices == [0, 1, 2, 3]
    assert groups[1].representative_index == 4
    assert groups[1].source_indices == [4]


def test_greedy_nmm_matches_sahi_threshold_boundary():
    boxes, conf, clid = _rows([
        (0, 0, 100, 100, 0.9, 1),
        (50, 0, 150, 100, 0.8, 1),
        (151, 0, 251, 100, 0.7, 1),
    ])
    groups = compute_tile_merge_groups(boxes, conf, clid, 0.5)
    assert len(groups) == 2
    assert groups[0].representative_index == 0
    assert groups[0].source_indices == [0, 1]
    assert groups[1].representative_index == 2
    assert groups[1].source_indices == [2]


def test_greedy_nmm_containment():
    # small low-confidence box fully inside a big one merges at IOS 0.9
    boxes, conf, clid = _rows([
        (0, 0, 220, 220, 0.9, 1),
        (20, 20, 80, 80, 0.7, 1),
    ])
    groups = compute_tile_merge_groups(boxes, conf, clid, 0.9)
    assert len(groups) == 1
    assert groups[0].source_indices == [0, 1]


def test_nms_per_class():
    boxes, conf, clid = _rows([
        (0, 0, 100, 100, 0.9, 1),
        (10, 0, 110, 100, 0.8, 1),   # IoU ~0.82 -> suppressed
        (10, 0, 110, 100, 0.7, 2),   # other class survives
        (300, 0, 400, 100, 0.6, 1),  # disjoint survives
    ])
    keep = compute_tile_nms_indices(boxes, conf, clid, 0.5)
    assert keep == [0, 2, 3]


def test_pose_tile_rect():
    kp = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]])
    rect = compute_pose_tile_rect(kp)
    assert rect is not None
    (cx, cy), (w, h), ang = rect
    assert (cx, cy) == pytest.approx((5.0, 2.5))
    assert sorted((round(w), round(h))) == [5, 10]
    # single point
    rect = compute_pose_tile_rect(np.array([[3.0, 4.0]]))
    assert rect[0] == (3.0, 4.0) and rect[1] == (1.0, 1.0)
    # all-NaN
    assert compute_pose_tile_rect(np.full((3, 2), np.nan)) is None


def test_region_proposal_two_stage(settings):
    from trex_tpu.detect.region import region_proposal_detect
    from trex_tpu.detect.yolo import Detections

    img = np.zeros((600, 800), np.uint8)

    def region_fn(image):
        # coarse region around (400, 300) and one around (100, 100)
        return Detections(np.array([[380.0, 280.0, 420.0, 320.0],
                                    [90.0, 90.0, 110.0, 110.0],
                                    [395.0, 290.0, 430.0, 330.0]]),
                          np.array([0.9, 0.8, 0.7]),
                          np.array([0, 0, 0]))

    crops = []

    def detect_fn(crop):
        crops.append(crop.shape)
        # one detection at crop-local (10, 10)
        return Detections(np.array([[10.0, 10.0, 30.0, 30.0]]),
                          np.array([0.95]), np.array([0]))

    det = region_proposal_detect(img, region_fn, detect_fn, settings,
                                 crop_size=200)
    # the two overlapping regions merged -> 2 crops, 2 detections
    assert len(crops) == 2
    assert all(s[0] >= 200 for s in crops)
    assert len(det) == 2
    # boxes are in full-frame coordinates (offset by crop origin)
    assert det.boxes[:, 0].max() > 100
