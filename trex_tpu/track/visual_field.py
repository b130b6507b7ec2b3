"""Visual-field host assembly: eye placement + batched device projection.

Re-creates VisualField::generate_eyes + calculate (reference
tracking/VisualField.cpp:203-330): eyes sit at the midline segment
selected by `visual_field_eye_offset`, displaced perpendicular to the
midline out to the outline intersection; eye view directions are the
midline direction rotated by +/- visual_field_eye_separation/2. Outlines
are tesselated to <=`max_distance` spacing (tesselate_outline) and the
projection itself runs batched on device (ops.raycast.visual_field).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..ops.raycast import FIELD_RESOLUTION, visual_field


def tesselate_outline(points: np.ndarray, max_distance: float = 5.0) -> np.ndarray:
    """Insert points so adjacent outline points are <= max_distance apart
    (VisualField::tesselate_outline)."""
    if len(points) < 2:
        return points
    out = []
    n = len(points)
    for i in range(n):
        p0 = points[i]
        p1 = points[(i + 1) % n]
        out.append(p0)
        d = float(np.hypot(*(p1 - p0)))
        if d > max_distance:
            k = int(math.ceil(d / max_distance))
            for j in range(1, k):
                out.append(p0 + (p1 - p0) * (j / k))
    return np.asarray(out, np.float32)


@dataclass
class EyeSet:
    pos: np.ndarray  # (2, 2)
    angle: np.ndarray  # (2,)


def generate_eyes(ind, frame: int, settings) -> Optional[EyeSet]:
    post = ind.posture_stuff(frame)
    basic = ind.basic_stuff(frame)
    if post is None or basic is None or post.midline is None \
            or len(post.midline.segments) < 3:
        return None
    mid = post.midline
    s = settings
    offset_frac = max(0.0, float(s["visual_field_eye_offset"]))
    sep = math.radians(float(s["visual_field_eye_separation"]))
    idx = min(len(mid.segments) - 1, int(len(mid.segments) * offset_frac))
    seg = mid.segments[idx]
    height = mid.heights[idx] if idx < len(mid.heights) else 4.0
    bx, by = basic.blob.bounds[:2]
    ox, oy = (mid.offset if mid.offset else (0.0, 0.0))
    # midline points are posture-crop-local (blob bounds + the posture
    # threshold-escalation crop offset); angle points tail->head; view
    # direction is the reversed midline direction (angle + pi)
    base_angle = mid.angle
    n_smooth = int(s["visual_field_history_smoothing"] or 0)
    if n_smooth > 0:
        # orientation smoothing over the last N posture frames
        # (VisualField.cpp visual_field_history_smoothing): mean unit
        # vector of the midline angles, current frame included
        vs = []
        for p in reversed(ind.posture):
            if p.frame > frame or p.frame < frame - n_smooth:
                continue
            a = p.midline_angle
            if math.isfinite(a):
                vs.append((math.cos(a), math.sin(a)))
        if vs:
            mx = sum(v[0] for v in vs) / len(vs)
            my = sum(v[1] for v in vs) / len(vs)
            if mx or my:
                base_angle = math.atan2(my, mx)
    angle = base_angle + math.pi
    nx, ny = -math.sin(angle), math.cos(angle)  # left normal
    half = height * 0.5 + 1.0
    p = np.array([seg[0] + bx + ox, seg[1] + by + oy])
    pos = np.stack([p + np.array([nx, ny]) * half,
                    p - np.array([nx, ny]) * half]).astype(np.float32)
    angles = np.array([angle - sep / 2, angle + sep / 2], np.float32)
    return EyeSet(pos=pos, angle=angles)


def compute_visual_fields(tracker, frame: int, settings,
                          max_points_per_fish: int = 256):
    """Visual fields for every posture-bearing individual at `frame`.

    Returns (ids, dict of (F, 2, 512) arrays) or None if no eligible fish.
    """
    eyes = []
    ids = []
    outlines = []
    for fid, ind in sorted(tracker.individuals.items()):
        post = ind.posture_stuff(frame)
        if post is None or post.outline is None:
            continue
        e = generate_eyes(ind, frame, settings)
        if e is None:
            continue
        ids.append(fid)
        eyes.append(e)
        outlines.append(tesselate_outline(post.outline, 5.0))
    if not ids:
        return None
    F = len(ids)
    P = max_points_per_fish
    pts = np.zeros((F * P, 2), np.float32)
    pids = np.full(F * P, -1, np.int32)
    valid = np.zeros(F * P, bool)
    for i, ol in enumerate(outlines):
        n = min(len(ol), P)
        if len(ol) > P:
            sel = np.linspace(0, len(ol) - 1, P).astype(int)
            ol = ol[sel]
            n = P
        pts[i * P : i * P + n] = ol[:n]
        # POSITIONAL index: the raycast kernel's self/winner exclusion
        # compares point ids against arange(F) eye indices
        pids[i * P : i * P + n] = i
        valid[i * P : i * P + n] = True
    eye_pos = np.stack([e.pos for e in eyes])
    eye_angle = np.stack([e.angle for e in eyes])

    # visual_field_shapes (VisualField.cpp:499-523): user polygons are
    # view-blocking objects — their convex hulls enter the raycast as
    # extra point groups with pseudo-ids F, F+1, ... (mapped below to
    # the reference's uint32_max-42-j object_id scheme). The raycast is
    # point-sampled, so each shape is tesselated ADAPTIVELY: spacing
    # fine enough that the angular gap at the nearest eye stays under
    # one FOV bin (the reference fills projected LINES; matching that
    # fidelity needs spacing ~ distance * bin_angle). Shapes append to
    # the flat arrays without the per-fish point cap.
    bin_angle = math.radians(130.0) / FIELD_RESOLUTION
    n_shapes = 0
    extra_pts = []
    for poly in (settings["visual_field_shapes"] or []):
        poly = np.asarray(poly, np.float32).reshape(-1, 2)
        if len(poly) < 3:
            continue
        try:
            import cv2

            hull = cv2.convexHull(poly).reshape(-1, 2).astype(np.float32)
        except ImportError:  # pragma: no cover
            hull = poly
        cx, cy = hull.mean(axis=0)
        half_diag = float(np.hypot(*(hull - (cx, cy)).T).max())
        d_eyes = np.hypot(eye_pos[..., 0] - cx, eye_pos[..., 1] - cy)
        min_d = max(1.0, float(d_eyes.min()) - half_diag)
        spacing = float(np.clip(min_d * bin_angle * 0.9, 0.05, 5.0))
        tess = tesselate_outline(hull, spacing)
        if len(tess) > 20000:  # runaway guard for huge close shapes
            tess = tess[np.linspace(0, len(tess) - 1, 20000).astype(int)]
        extra_pts.append(tess)
        n_shapes += 1
    if F + n_shapes > 511:
        # the raycast packs (depth, id) into (13 + 9)-bit keys
        raise ValueError(
            f"visual fields support at most 511 concurrent individuals "
            f"+ shapes (got {F + n_shapes}): the segment-min key packs "
            "ids into 9 bits")
    if extra_pts:
        pts = np.concatenate([pts] + extra_pts)
        pids = np.concatenate(
            [pids] + [np.full(len(t), F + j, np.int32)
                      for j, t in enumerate(extra_pts)])
        valid = np.concatenate(
            [valid] + [np.ones(len(t), bool) for t in extra_pts])
    bg = tracker.background
    max_d = float(np.hypot(*bg.shape[:2])) if bg is not None else 1000.0
    out = visual_field(pts, pids, valid, eye_pos, eye_angle,
                       np.float32(max_d))
    out = {k: np.asarray(v) for k, v in out.items()}
    # id planes come back as positional indices: map fish to real ids
    # and shapes to the reference's pseudo-ids (uint32_max - 42 - j)
    ids_arr = np.asarray(ids, np.int64)
    shape_base = np.int64(4294967295 - 42)
    for k in out:
        if k.startswith("id"):
            plane = out[k].astype(np.int64)
            fish_hit = (plane >= 0) & (plane < F)
            shape_hit = plane >= F
            mapped = np.where(fish_hit,
                              ids_arr[np.clip(plane, 0, F - 1)], -1)
            out[k] = np.where(shape_hit, shape_base - (plane - F),
                              mapped)
    return ids, out


def export_visual_fields(tracker, settings, output_dir, video_name: str):
    """Per-fish visual-field NPZ over all posture frames
    (ui/Export.cpp visual-fields section)."""
    from pathlib import Path

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    prefix = settings["individual_prefix"] or "fish"
    frames_by_fish: dict[int, list] = {}
    fields_by_fish: dict[int, dict[str, list]] = {}
    for frame in range(tracker.start_frame, tracker.end_frame + 1):
        res = compute_visual_fields(tracker, frame, settings)
        if res is None:
            continue
        ids, fields = res
        for i, fid in enumerate(ids):
            frames_by_fish.setdefault(fid, []).append(frame)
            store = fields_by_fish.setdefault(
                fid, {k: [] for k in fields})
            for k in fields:
                store[k].append(fields[k][i])
    paths = []
    for fid, frames in frames_by_fish.items():
        path = output_dir / f"{video_name}_visual_field_{prefix}{fid}.npz"
        arrays = {k: np.stack(v) for k, v in fields_by_fish[fid].items()}
        arrays["frames"] = np.asarray(frames, np.int64)
        np.savez_compressed(path, **arrays)
        paths.append(path)
    return paths
