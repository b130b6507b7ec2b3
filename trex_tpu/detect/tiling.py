"""SAHI-style tiling + tile-merge postprocessing.

Re-creates the reference's tiling math (core/TileImage.cpp:
compute_tiling_dimensions :23-73, compute_offsets :75-106,
compute_tile_bounds :117-153) and the YOLO tile-merge postprocess
(python/YOLO.cpp: GreedyNMM IOS groups compute_tile_merge_groups :80,
per-class NMS compute_tile_nms_indices :164, rotated-rect pose NMS :225,
compute_pose_tile_rect :286) — both mirror SAHI's sliced-prediction
postprocess (batched_greedy_nmm / batched_nms).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def compute_tiling_dimensions(frame_size, detector_size,
                              detect_tile_target_width: int,
                              detect_tile_image: int):
    """Returns ((new_w, new_h), (tile_w, tile_h))."""
    fw, fh = frame_size
    dw, dh = detector_size
    new_size = (dw, dh)
    tile_size = (dw, dh)
    if detect_tile_target_width <= 0 and detect_tile_image <= 1:
        return new_size, tile_size
    base_edge = max(int(dw), int(dh))
    tile_edge = 320 if base_edge == 0 else base_edge
    if detect_tile_target_width > 0:
        tile_edge = detect_tile_target_width
    if tile_edge == 0:
        tile_edge = 320
    tiles_x = detect_tile_image if detect_tile_image > 1 else 1
    if detect_tile_target_width > 0:
        if fw == 0:
            fw = tile_edge
        tiles_x = max(tiles_x, math.ceil(fw / tile_edge))
    tiles_x = max(tiles_x, 1)
    tiles_y = 1
    if detect_tile_image > 1:
        ratio = (fh / fw) if fw > 0 and fh > 0 else 1.0
        tiles_y = max(tiles_y, math.ceil(ratio * tiles_x))
    if detect_tile_target_width > 0:
        if fh == 0:
            fh = tile_edge
        tiles_y = max(tiles_y, math.ceil(fh / tile_edge))
    tiles_y = max(tiles_y, 1)
    return ((tile_edge * tiles_x, tile_edge * tiles_y),
            (tile_edge, tile_edge))


def compute_offsets(extent: int, tile_extent: int, stride: int) -> list[int]:
    if tile_extent <= 0 or extent <= tile_extent:
        return [0]
    offsets = [0]
    current = 0
    while current + tile_extent < extent:
        nxt = current + stride
        if nxt + tile_extent > extent:
            nxt = extent - tile_extent
        if nxt <= current:
            break
        offsets.append(nxt)
        current = nxt
    last = extent - tile_extent
    if last > 0 and offsets[-1] != last:
        offsets.append(last)
    out = []
    for o in offsets:  # std::unique removes consecutive duplicates
        if not out or out[-1] != o:
            out.append(o)
    return out


def compute_tile_bounds(video_size, detector_size,
                        detect_tile_target_width: int,
                        detect_tile_image: int,
                        detect_tile_overlap: float) -> list[tuple]:
    """Tile rectangles (x, y, w, h) in original video coordinates."""
    vw, vh = video_size
    dw, dh = detector_size
    if vw == 0 or vh == 0 or dw == 0 or dh == 0:
        return []
    if detect_tile_target_width == 0 and detect_tile_image <= 1:
        return []
    _, (tw, th) = compute_tiling_dimensions(
        video_size, detector_size, detect_tile_target_width,
        detect_tile_image)
    overlap = min(max(detect_tile_overlap, 0.0), 0.95)
    stride_x = max(1, int(round(tw * (1 - overlap))))
    stride_y = max(1, int(round(th * (1 - overlap))))
    xs = compute_offsets(int(vw), int(tw), stride_x)
    ys = compute_offsets(int(vh), int(th), stride_y)
    return [(x, y, tw, th) for y in ys for x in xs]


# ---------------------------------------------------------------------------
# tile-merge postprocess over detection rows
# rows: structured as arrays x0,y0,x1,y1,conf,clid
# ---------------------------------------------------------------------------

def _areas(boxes: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, boxes[:, 2] - boxes[:, 0]) * \
        np.maximum(0.0, boxes[:, 3] - boxes[:, 1])


def _intersections(ref: np.ndarray, others: np.ndarray) -> np.ndarray:
    x0 = np.maximum(ref[0], others[:, 0])
    y0 = np.maximum(ref[1], others[:, 1])
    x1 = np.minimum(ref[2], others[:, 2])
    y1 = np.minimum(ref[3], others[:, 3])
    return np.maximum(0.0, x1 - x0) * np.maximum(0.0, y1 - y0)


@dataclass
class TileMergeGroup:
    representative_index: int
    source_indices: list[int] = field(default_factory=list)


def compute_tile_merge_groups(boxes: np.ndarray, conf: np.ndarray,
                              clid: np.ndarray,
                              ios_threshold: float) -> list[TileMergeGroup]:
    """GreedyNMM: per-class confidence-sorted grouping by
    intersection-over-smaller-area (YOLO.cpp:80-163)."""
    n = len(boxes)
    if n == 0:
        return []
    ios_threshold = min(max(ios_threshold, 0.0), 1.0)
    areas = _areas(boxes)
    groups: list[TileMergeGroup] = []
    for c in set(clid[areas > 0].tolist()):
        idx = [i for i in range(n) if clid[i] == c and areas[i] > 0]
        idx.sort(key=lambda i: (-conf[i], i))
        suppressed = [False] * len(idx)
        for i, ri in enumerate(idx):
            if suppressed[i]:
                continue
            group = TileMergeGroup(representative_index=ri,
                                   source_indices=[ri])
            ref = boxes[ri]
            for j in range(i + 1, len(idx)):
                if suppressed[j]:
                    continue
                cj = idx[j]
                inter = float(_intersections(ref, boxes[cj : cj + 1])[0])
                if inter <= 0:
                    continue
                min_area = min(areas[ri], areas[cj])
                containment = inter / min_area if min_area > 0 else 0.0
                if containment >= ios_threshold:
                    suppressed[j] = True
                    group.source_indices.append(cj)
            group.source_indices.sort()
            groups.append(group)
    groups.sort(key=lambda g: g.representative_index)
    return groups


def compute_tile_nms_indices(boxes: np.ndarray, conf: np.ndarray,
                             clid: np.ndarray,
                             iou_threshold: float) -> list[int]:
    """Per-class IoU NMS (YOLO.cpp:164-224)."""
    n = len(boxes)
    if n == 0:
        return []
    iou_threshold = min(max(iou_threshold, 0.0), 1.0)
    areas = _areas(boxes)
    keep: list[int] = []
    for c in set(clid[areas > 0].tolist()):
        idx = [i for i in range(n) if clid[i] == c and areas[i] > 0]
        idx.sort(key=lambda i: (-conf[i], i))
        suppressed = [False] * len(idx)
        for i, ri in enumerate(idx):
            if suppressed[i]:
                continue
            keep.append(ri)
            ref = boxes[ri]
            for j in range(i + 1, len(idx)):
                if suppressed[j]:
                    continue
                cj = idx[j]
                inter = float(_intersections(ref, boxes[cj : cj + 1])[0])
                if inter <= 0:
                    continue
                union = areas[ri] + areas[cj] - inter
                if union > 0 and inter / union >= iou_threshold:
                    suppressed[j] = True
    keep = sorted(set(keep))
    return keep


def compute_pose_tile_rect(keypoints: np.ndarray) -> Optional[tuple]:
    """Min-area rotated rect over finite keypoints
    (YOLO.cpp compute_pose_tile_rect :286). Returns
    ((cx, cy), (w, h), angle_deg) or None."""
    pts = keypoints[np.isfinite(keypoints).all(axis=1)]
    if len(pts) == 0:
        return None
    if len(pts) == 1:
        return ((float(pts[0, 0]), float(pts[0, 1])), (1.0, 1.0), 0.0)
    try:
        import cv2

        rect = cv2.minAreaRect(pts.astype(np.float32))
        (cx, cy), (w, h), a = rect
        return ((cx, cy), (max(w, 1.0), max(h, 1.0)), a)
    except ImportError:  # pragma: no cover
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        return (((x0 + x1) / 2, (y0 + y1) / 2),
                (max(x1 - x0, 1.0), max(y1 - y0, 1.0)), 0.0)


def compute_tile_nms_indices_for_rotated_rects(
        rects: list, confidences: np.ndarray, classes: np.ndarray,
        iou_threshold: float) -> list[int]:
    """Rotated-rect NMS for pose detections (YOLO.cpp:225-285)."""
    import cv2

    n = len(rects)
    if n == 0:
        return []
    iou_threshold = min(max(iou_threshold, 0.0), 1.0)

    def area(r):
        return r[1][0] * r[1][1]

    def inter(a, b):
        ra = (tuple(a[0]), tuple(a[1]), a[2])
        rb = (tuple(b[0]), tuple(b[1]), b[2])
        res, region = cv2.rotatedRectangleIntersection(ra, rb)
        if res == cv2.INTERSECT_NONE or region is None:
            return 0.0
        return float(cv2.contourArea(region))

    keep = []
    for c in set(int(x) for x in classes):
        idx = [i for i in range(n) if int(classes[i]) == c
               and area(rects[i]) > 0]
        idx.sort(key=lambda i: (-confidences[i], i))
        suppressed = [False] * len(idx)
        for i, ri in enumerate(idx):
            if suppressed[i]:
                continue
            keep.append(ri)
            for j in range(i + 1, len(idx)):
                if suppressed[j]:
                    continue
                cj = idx[j]
                inter_a = inter(rects[ri], rects[cj])
                if inter_a <= 0:
                    continue
                union = area(rects[ri]) + area(rects[cj]) - inter_a
                if union > 0 and inter_a / union >= iou_threshold:
                    suppressed[j] = True
    return sorted(set(keep))
