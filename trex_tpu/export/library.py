"""Output field library — named per-frame functions over individuals.

Re-creates Output::Library (reference tracking/OutputLibrary.{h,cpp},
field table docs/formats.rst:18-78): ~40 named functions, each evaluated
per (individual, frame) with a source modifier:

    #wcentroid  — weighted centroid (the stored centroid record)
    #centroid   — same record in the current reference
    #pcentroid  — posture centroid
    #head       — posture head point
    RAW/SMOOTH  — raw or smoothed series

Positions/speeds are exported in cm via cm_per_pixel; angles in radians.
Invalid values render as infinity (golden CSVs use "inf").
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

INVALID = float("inf")

# fields that ignore the source modifier entirely
CENTROID_ONLY = {
    "blobid", "frame", "time", "timestamp", "missing", "num_pixels",
    "midline_length", "midline_x", "midline_y", "midline_segment_length",
    "normalized_midline", "MIDLINE_OFFSET", "visual_identification_p",
    "qr_id", "tracklet_id",
}


class EvalContext:
    def __init__(self, tracker, settings, pv_file=None):
        self.tracker = tracker
        self.settings = settings
        self.cm = settings["cm_per_pixel"] or 1.0
        self._border = None
        self._pv = pv_file
        # category fields resolve through THIS context's tracker store
        # (no module-global rebinding: a store from one export must not
        # leak into the next tracker's context)
        self.category_store = getattr(tracker, "category_store", None)

    @property
    def border(self):
        """Arena Border model, built lazily (heatmap types sample the
        pv file when one was provided)."""
        if self._border is None:
            from ..track.border import Border

            self._border = Border(self.settings,
                                  self.tracker.background)
            if self._pv is not None:
                self._border.update_from_video(self._pv)
        return self._border


def _record(ind, frame: int, source: str):
    source = (source or "wcentroid").lower()
    if source in ("wcentroid", "centroid"):
        b = ind.basic_stuff(frame)
        return b.centroid if b else None
    post = ind.posture_stuff(frame)
    if post is None:
        return None
    if source == "head":
        return post.head
    if source == "pcentroid":
        return post.centroid_posture
    return None


def _smooth_window(ind, frame, source, attr, ctx, half: int = 2):
    vals = []
    for f in range(frame - half, frame + half + 1):
        r = _record(ind, f, source)
        if r is not None:
            vals.append(getattr(r, attr))
    return float(np.mean(vals)) if vals else None


def _pos_attr(attr):
    def fn(ind, frame, source, smooth, ctx):
        r = _record(ind, frame, source)
        if r is None:
            return INVALID
        if smooth:
            v = _smooth_window(ind, frame, source, attr, ctx)
            return v * ctx.cm if v is not None else INVALID
        return getattr(r, attr) * ctx.cm
    return fn


def _speed(ind, frame, source, smooth, ctx):
    r = _record(ind, frame, source)
    if r is None:
        return INVALID
    if smooth:
        vx = _smooth_window(ind, frame, source, "vx", ctx)
        vy = _smooth_window(ind, frame, source, "vy", ctx)
        if vx is None:
            return INVALID
        return math.hypot(vx, vy) * ctx.cm
    return r.speed(ctx.cm)


def _acceleration(ind, frame, source, smooth, ctx):
    r = _record(ind, frame, source)
    if r is None:
        return INVALID
    if smooth:
        ax = _smooth_window(ind, frame, source, "ax", ctx)
        ay = _smooth_window(ind, frame, source, "ay", ctx)
        if ax is None:
            return INVALID
        return math.hypot(ax, ay) * ctx.cm
    return r.acceleration(ctx.cm)


def _angle(ind, frame, source, smooth, ctx):
    r = _record(ind, frame, source)
    return r.angle if r else INVALID


def _num_pixels(ind, frame, source, smooth, ctx):
    b = ind.basic_stuff(frame)
    return b.blob.num_pixels if b else INVALID


def _blobid(ind, frame, source, smooth, ctx):
    b = ind.basic_stuff(frame)
    return b.blob.blob_id if b else INVALID


def _midline_length(ind, frame, source, smooth, ctx):
    p = ind.posture_stuff(frame)
    if p and not math.isnan(p.midline_length):
        return p.midline_length
    return INVALID


def _midline_xy(axis):
    def fn(ind, frame, source, smooth, ctx):
        p = ind.posture_stuff(frame)
        if p and p.midline is not None and len(p.midline.segments):
            return float(p.midline.segments[-1][axis]) * ctx.cm
        return INVALID
    return fn


def _border_distance(ind, frame, source, smooth, ctx):
    r = _record(ind, frame, source or "pcentroid")
    if r is None:
        return INVALID
    d = ctx.border.distance(r.x, r.y)
    return d * ctx.cm if math.isfinite(d) else INVALID


def _neighbor_distance(ind, frame, source, smooth, ctx):
    r = _record(ind, frame, source)
    if r is None:
        return INVALID
    ds = []
    for other in ctx.tracker.individuals.values():
        if other is ind:
            continue
        ro = _record(other, frame, source)
        if ro is not None:
            ds.append(math.hypot(r.x - ro.x, r.y - ro.y))
    return float(np.mean(ds)) * ctx.cm if ds else INVALID


def _missing(ind, frame, source, smooth, ctx):
    return 0.0 if ind.has(frame) else 1.0


def _time(ind, frame, source, smooth, ctx):
    return ctx.tracker.frame_times.get(frame, INVALID)


def _timestamp(ind, frame, source, smooth, ctx):
    t = ctx.tracker.frame_times.get(frame)
    return t * 1e6 if t is not None else INVALID


def _vi_p(ind, frame, source, smooth, ctx):
    b = ind.basic_stuff(frame)
    if not b:
        return INVALID
    preds = ctx.tracker.predicted.get(frame, {})
    probs = preds.get(b.blob.blob_id)
    if probs is None:
        return INVALID
    return float(np.max(probs))


FUNCTIONS: dict[str, Callable] = {
    "X": _pos_attr("x"),
    "Y": _pos_attr("y"),
    "VX": _pos_attr("vx"),
    "VY": _pos_attr("vy"),
    "AX": _pos_attr("ax"),
    "AY": _pos_attr("ay"),
    "SPEED": _speed,
    "ACCELERATION": _acceleration,
    "ANGLE": _angle,
    "ANGULAR_V": lambda ind, frame, source, smooth, ctx: (
        r.angular_velocity if (r := _record(ind, frame, source)) else INVALID),
    "ANGULAR_A": lambda ind, frame, source, smooth, ctx: (
        r.angular_acceleration if (r := _record(ind, frame, source)) else INVALID),
    "num_pixels": _num_pixels,
    "blobid": _blobid,
    "midline_length": _midline_length,
    "midline_x": _midline_xy(0),
    "midline_y": _midline_xy(1),
    "BORDER_DISTANCE": _border_distance,
    "NEIGHBOR_DISTANCE": _neighbor_distance,
    "missing": _missing,
    "time": _time,
    "timestamp": _timestamp,
    "frame": lambda ind, frame, source, smooth, ctx: float(frame),
    "visual_identification_p": _vi_p,
    "MIDLINE_OFFSET": lambda ind, frame, source, smooth, ctx: (
        _midline_offset_field(ind, frame)),
    "normalized_midline": lambda ind, frame, source, smooth, ctx: (
        p.midline_angle if (p := ind.posture_stuff(frame)) else INVALID),
    "outline_size": lambda ind, frame, source, smooth, ctx: (
        float(p.outline_size) if (p := ind.posture_stuff(frame))
        else INVALID),
    "tracklet_id": lambda ind, frame, source, smooth, ctx: next(
        (float(i) for i, (t0, t1) in enumerate(ind.tracklets)
         if t0 <= frame <= t1), INVALID),
    "consecutive": lambda ind, frame, source, smooth, ctx: next(
        (float(t1 - t0 + 1) for (t0, t1) in ind.tracklets
         if t0 <= frame <= t1), INVALID),
    "ORIENTATION": _angle,
    "SPEED_OLD": _speed,
    "midline_segment_length": lambda ind, frame, source, smooth, ctx: (
        (p.midline_length / max(1, ctx.settings["midline_resolution"] - 1))
        if (p := ind.posture_stuff(frame))
        and not math.isnan(p.midline_length) else INVALID),
}

# units for header annotation (output_annotations defaults)
def column_title(field: str, modifiers: list[str], annotations: dict) -> str:
    sources = [m for m in modifiers
               if m.lower() in ("wcentroid", "centroid", "pcentroid", "head")]
    name = field
    if sources and field not in CENTROID_ONLY:
        name += "#" + sources[0].lower()
    unit = annotations.get(field)
    if unit:
        name += f" ({unit})"
    return name


def _midline_offset_field(ind, frame):
    from ..track.events import midline_offset

    v = midline_offset(ind, frame)
    return v if not math.isnan(v) else INVALID


def _pose_field(field: str):
    """poseX<i>/poseY<i>: keypoint coordinates from the blob prediction
    (find_user_defined_pose_fields, default_config.cpp:360-420)."""
    axis = 0 if field.startswith("poseX") else 1
    idx = int(field[5:])

    def fn(ind, frame, source, smooth, ctx):
        b = ind.basic_stuff(frame)
        pred = b.blob.prediction if b else None
        kp = None
        if isinstance(pred, dict):
            kp = pred.get("keypoints")
        elif pred is not None:
            kp = getattr(pred, "pose", None)
        if kp is None or idx >= len(kp):
            return INVALID
        return float(kp[idx][axis]) * ctx.cm

    return fn


def _neighbor_vector_t(ind, frame, source, smooth, ctx):
    """NEIGHBOR_VECTOR_T: signed distance to the nearest neighbor along
    the body-transverse axis (OutputLibrary neighbor vector family)."""
    r = _record(ind, frame, source)
    if r is None:
        return INVALID
    best = None
    for other in ctx.tracker.individuals.values():
        if other is ind:
            continue
        ro = _record(other, frame, source)
        if ro is None:
            continue
        d = math.hypot(r.x - ro.x, r.y - ro.y)
        if best is None or d < best[0]:
            best = (d, ro)
    if best is None:
        return INVALID
    _, ro = best
    # project neighbor offset onto the perpendicular of the heading
    nx, ny = -math.sin(r.angle), math.cos(r.angle)
    return ((ro.x - r.x) * nx + (ro.y - r.y) * ny) * ctx.cm


def _dot_v(ind, frame, source, smooth, ctx):
    """DOT_V: dot product of own and nearest neighbor's velocity
    direction (alignment measure)."""
    r = _record(ind, frame, source)
    if r is None:
        return INVALID
    best = None
    for other in ctx.tracker.individuals.values():
        if other is ind:
            continue
        ro = _record(other, frame, source)
        if ro is None:
            continue
        d = math.hypot(r.x - ro.x, r.y - ro.y)
        if best is None or d < best[0]:
            best = (d, ro)
    if best is None:
        return INVALID
    ro = best[1]
    n1 = math.hypot(r.vx, r.vy)
    n2 = math.hypot(ro.vx, ro.vy)
    if n1 == 0 or n2 == 0:
        return INVALID
    return (r.vx * ro.vx + r.vy * ro.vy) / (n1 * n2)


def _events_field(attr):
    def fn(ind, frame, source, smooth, ctx):
        from ..track.events import detect_events, midline_offset

        if attr == "threshold_reached":
            o = midline_offset(ind, frame)
            if math.isnan(o):
                return INVALID
            return 1.0 if abs(o) >= ctx.settings["limit"] else 0.0
        events = ctx.__dict__.setdefault("_events_cache", {})
        if ind.identity not in events:
            events[ind.identity] = detect_events(ind, ctx.settings)
        for ev in events[ind.identity]:
            if ev.begin <= frame <= ev.end:
                return float(getattr(ev, attr))
        return INVALID
    return fn


FUNCTIONS.update({
    "NEIGHBOR_VECTOR_T": _neighbor_vector_t,
    "DOT_V": _dot_v,
    "L_V": lambda ind, frame, source, smooth, ctx: (
        r.speed(ctx.cm) if (r := _record(ind, frame, source)) else INVALID),
    "v_direction": lambda ind, frame, source, smooth, ctx: (
        math.atan2(r.vy, r.vx) if (r := _record(ind, frame, source))
        and (r.vx or r.vy) else INVALID),
    "event_energy": _events_field("energy"),
    "event_acceleration": _events_field("acceleration"),
    "event_direction_change": _events_field("direction_change"),
    "tailbeat_threshold": _events_field("threshold_reached"),
    "tailbeat_peak": _events_field("energy"),
    "threshold_reached": _events_field("threshold_reached"),
    "amplitude": lambda ind, frame, source, smooth, ctx: (
        abs(v) if not math.isinf(
            v := _midline_offset_field(ind, frame)) else INVALID),
    "average_category": lambda ind, frame, source, smooth, ctx:
        _category(ind, frame, ctx),
    "category": lambda ind, frame, source, smooth, ctx:
        _category(ind, frame, ctx),
    "qr_id": lambda ind, frame, source, smooth, ctx: (
        float(t) if (t := ctx.tracker.tag_assignments.get(
            frame, {}).get(ind.identity)) is not None else INVALID),
})


def _category(ind, frame, ctx) -> float:
    """category/average_category from the context's DataStore
    (OutputLibrary category fields; INVALID without a store)."""
    store = getattr(ctx, "category_store", None)
    if store is None:
        return INVALID
    lid = store.ranged_label(frame, ind.identity)
    return float(lid) if lid is not None else INVALID


def set_category_lookup(ctx: EvalContext, store):
    """Attach a categorize.DataStore to a context (kept for callers;
    category fields read ctx.category_store)."""
    ctx.category_store = store


def evaluate(ctx: EvalContext, ind, frame: int, field: str,
             modifiers: list[str]) -> float:
    fn = FUNCTIONS.get(field)
    if fn is None and len(field) > 5 and field[:5] in ("poseX", "poseY") \
            and field[5:].isdigit():
        # cache the parsed closure like every other table entry (one
        # per column, not one per (individual, frame) evaluation)
        fn = FUNCTIONS[field] = _pose_field(field)
    if fn is None:
        return INVALID
    source = None
    smooth = False
    for m in modifiers:
        lm = m.lower()
        if lm in ("wcentroid", "centroid", "pcentroid", "head"):
            source = lm
        elif lm == "smooth":
            smooth = True
    try:
        v = fn(ind, frame, source, smooth, ctx)
    except Exception:
        return INVALID
    if v is None:
        return INVALID
    return float(v)
