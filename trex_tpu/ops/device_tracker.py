"""Device-resident tracking loop (SURVEY §7 stage 3).

The per-frame tracking recurrence runs as a `lax.scan` with the
tracker state as carry, fused behind one jit with the batched run-CC
detection (ops/runcc) — frames never round-trip to the host inside a
chunk; the host consumes the stacked per-frame assignment history
afterwards (the "host keeps archives" split).

Semantics mirror track/engine.FastTracker's first/second pass exactly
for the `match_mode=approximate`, `track_do_history_split=false`
configuration (itself differential-tested against the object Tracker):

- caches: tdelta/time-probability per Individual.cache_for_frame
  (Individual.cpp:2061-2105), with the recent-samples window counted
  over a seen-ring of the last `frame_rate` frames;
- probability: p = tprob / (1 + d/global_td * cm/max_speed)^2 against
  blob bbox centers (Individual.cpp:2109-2237 S*T with the global
  one-frame delta of Individual.cpp:1753);
- first pass: greedy per blob in index order, highest-p unused ACTIVE
  fish (PairingGraph.cpp:1141-1193 approximate mode), p > p_min;
- second pass: reactivation of INACTIVE fish (gap >= t_max) with
  p = p_min + (1/sqdist/tdelta)(1-p_min) against blob centroids
  (Tracker.cpp:1846-1975), then new-fish creation in blob order while
  under track_max_individuals.

With track_do_history_split on and a SplitSpec (the fused frames
path), history splits run IN-GRAPH: ops/device_split's exact
expectation kernel picks the blobs the host would split, the
vmapped threshold-escalation executor splits them from the frame
pixels, and the child pieces replace their parents at the parent's
table position. `needs_host` then only flags what genuinely needs the
host: marginal float decisions (the device defers instead of
guessing), capacity overflows, start-frame big-blob splits
(_split_big_start), and `huge` parents (engine force_set_recount
path). Without a SplitSpec (no pixel data on device, e.g. the packed
pv path), any contested frame is flagged via the conservative
trigger (>= 2 active fish within the split radius of one blob's
track-mask runs). The production consumer
(track/device_engine.DeviceTracker) replays flagged frames through a
state-spliced host FastTracker and resumes the scan from the
corrected carry.

The packed-transfer layer at the bottom of this module moves one
array per direction per chunk (see its comment block for the measured
tunnel-latency rationale).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TrackParams(NamedTuple):
    """Static tracking configuration (hashable for jit)."""
    max_fish: int
    p_min: float
    cm_per_pixel: float
    max_speed: float
    t_max: float             # track_max_reassign_time
    frame_rate: int
    time_prob_enabled: bool
    minimum_frames: int      # min(frame_rate, 5)
    size_min: float          # track_size_filter (recount, cm^2)
    size_max: float
    do_history_split: bool = False
    split_radius: float = 0.0  # HistorySplit max_d in px (0 = off)
    detect_size_min: float = 0.0   # detect_size_filter (cm^2)
    detect_size_max: float = float("inf")
    has_size_filter: bool = False  # track_size_filter set at all
    match_optimal: bool = False    # automatic/hungarian/tree modes:
    # first pass solved optimally on device (ops/device_match auction)
    # instead of the approximate greedy
    do_posture: bool = False       # calculate_posture: the packed
    # carry grows a (F, 2) posture-direction section and the fused
    # program appends a posture scan (ops/device_posture)
    size_ranges: tuple = ()        # full multi-range filters: the
    # collapsed [min, max] pair is only exact for <=1 range, the host
    # keeps in-ANY-range semantics (SizeFilters.in_range_of_one)
    detect_size_ranges: tuple = ()
    # track_speed_decay < 1: matching distances measure from the
    # decay-weighted velocity extrapolation (Individual.cpp:1995-2025).
    # The carry grows a (F, WIN, 5) window section [frame, x, y, time,
    # global step]; fish whose window the in-graph array math cannot
    # reproduce (chain breaks, gaps) flag the frame for the host
    # replay — the spliced helper runs the exact scalar estimate.
    do_decay: bool = False
    decay_lambda: float = 1.0      # decay^4
    # track_trusted_probability: assignment probabilities below this
    # break tracklets in the archive; a committed f32 probability
    # within p_err of the cut could break differently under the
    # host's f64 — such frames defer
    trusted_p: float = 0.0


# window length of the decay estimate (Individual._win / CACHE_WINDOW)
DECAY_WIN = 7

# f32 machine epsilon: unit for the carry-packing / f32-arithmetic
# error bounds that widen the matching passes' deferral bands
EPS32 = float(2.0 ** -23)


def _in_size_ranges(size, ranges: tuple, lo: float, hi: float):
    """In-any-range test matching the host SizeFilters.in_range_of_one;
    the collapsed [lo, hi] fast path is exact when <= 1 range is set."""
    if len(ranges) <= 1:
        return (size >= lo) & (size <= hi)
    ok = jnp.zeros(size.shape, bool)
    for rlo, rhi in ranges:
        ok = ok | ((size >= rlo) & (size <= rhi))
    return ok


def params_from_settings(s) -> TrackParams:
    fr = int(s["frame_rate"] or 25)
    ranges = s["track_size_filter"] or []
    lo = min((r[0] for r in ranges), default=0.0)
    hi = max((r[1] for r in ranges), default=float("inf"))
    cm = float(s["cm_per_pixel"] or 1.0)
    # split radius uses the RAW track_max_speed like HistorySplit
    # (0 -> no history splits, see engine._apply_history_split)
    radius = (float(s["track_max_speed"]) / cm) / max(1.0, float(fr)) \
        * 0.5
    dranges = s["detect_size_filter"] or []
    dlo = min((r[0] for r in dranges), default=0.0)
    dhi = max((r[1] for r in dranges), default=float("inf"))
    return TrackParams(
        max_fish=int(s["track_max_individuals"]),
        p_min=float(s["match_min_probability"]),
        cm_per_pixel=cm,
        max_speed=float(s["track_max_speed"]),
        t_max=float(s["track_max_reassign_time"]),
        frame_rate=fr,
        time_prob_enabled=bool(s["track_time_probability_enabled"]),
        minimum_frames=min(fr, 5),
        size_min=float(lo), size_max=float(hi),
        do_history_split=bool(s["track_do_history_split"]),
        split_radius=radius,
        detect_size_min=float(dlo), detect_size_max=float(dhi),
        has_size_filter=bool(ranges),
        match_optimal=s["match_mode"] != "approximate",
        do_posture=bool(s["calculate_posture"]),
        size_ranges=tuple((float(a), float(b)) for a, b in ranges),
        detect_size_ranges=tuple((float(a), float(b))
                                 for a, b in dranges),
        do_decay=min(1.0, max(0.0, float(s["track_speed_decay"])))
        ** 4 < 1.0,
        decay_lambda=min(1.0, max(0.0,
                                  float(s["track_speed_decay"]))) ** 4,
        trusted_p=float(s["track_trusted_probability"] or 0.0))


def _init_carry(P: TrackParams, start_frame=0, t0=0.0):
    F = P.max_fish
    c = dict(
        last_x=jnp.zeros(F), last_y=jnp.zeros(F),
        last_time=jnp.zeros(F),
        last_frame=jnp.full(F, -(10 ** 9), jnp.int32),
        n_basic=jnp.zeros(F, jnp.int32),
        seen=jnp.zeros((F, P.frame_rate), bool),  # ring, newest last
        n_fish=jnp.asarray(0, jnp.int32),
        start_frame=jnp.asarray(start_frame).astype(jnp.int32),
        prev_time=jnp.asarray(t0).astype(jnp.float32))
    if P.do_decay:
        win = jnp.zeros((F, DECAY_WIN, 5))
        c["win"] = win.at[:, :, 0].set(-1e9)
        # accumulated decay-walk displacement for chain-broken fish
        # [dx, dy, |err| bound]; zeroed on every assignment
        c["dacc"] = jnp.zeros((F, 3))
    return c


def _decay_estimates(win: jax.Array, frame, P: TrackParams,
                     dacc: jax.Array = None):
    """In-graph decay-extrapolated positions over the carry's
    (F, W, 5) windows [frame, x, y, time, global step] — the port of
    cache_batch.window_motion / window_estimate_scalar (Individual.
    cpp:1940-2025). Returns (est_x, est_y, need_host, est_err,
    motion): need_host marks fish whose window has chain breaks
    (invalid pairs) — the exact scalar walk runs host-side via the
    assist replay. Fish with a frame GAP before the estimate no
    longer defer: their decay walk over the skipped frames is
    accumulated incrementally in the carry's `dacc` section (one term
    per scan step while unassigned, exactly the host scalar loop's
    per-frame weights (1+lam)/(1+lam*j)), and `est = last + first
    term + dacc`. est_err is a first-order bound on |est_f32 -
    est_f64| (the host replay computes the same chain in f64),
    including the accumulated walk's error (dacc[:, 2]): the matching
    pass widens its match_min_probability deferral band by slope *
    est_err so no boundary edge is decided on-device when the f32
    carry could sit on the other side of the host's f64 value
    (validated empirically by tests/test_match_boundary.py). `motion`
    carries (speed, dir, accd, counts, rel-error) terms the scan step
    uses to extend dacc for still-unassigned fish."""
    wf = win[:, :, 0]
    prev = wf[:, -1]
    valid = (wf > -1e8) & (wf >= (prev - 6)[:, None])
    x = win[:, :, 1]
    y = win[:, :, 2]
    t = win[:, :, 3]
    st = win[:, :, 4]
    dt = t[:, 1:] - t[:, :-1]
    pair_exists = valid[:, 1:] & valid[:, :-1]
    pair_ok = pair_exists & (dt > 0) & (st[:, 1:] <= 1.0)
    bad = jnp.any(pair_exists & ~pair_ok, axis=1)
    dts = jnp.where(pair_ok, dt, 1.0)
    vx = jnp.where(pair_ok, (x[:, 1:] - x[:, :-1]) / dts, 0.0)
    vy = jnp.where(pair_ok, (y[:, 1:] - y[:, :-1]) / dts, 0.0)
    l_sq = vx * vx + vy * vy
    cm = P.cm_per_pixel
    max_speed_px = (P.max_speed / cm) if cm else 0.0
    if max_speed_px > 0:
        over = pair_ok & (l_sq >= max_speed_px * max_speed_px)
        scale = jnp.where(
            over, max_speed_px / jnp.sqrt(jnp.where(l_sq > 0, l_sq,
                                                    1.0)), 1.0)
        vx = vx * scale
        vy = vy * scale
        l_sq = jnp.where(over, max_speed_px * max_speed_px, l_sq)
    counts = pair_ok.sum(axis=1)
    used = jnp.maximum(counts, 1)
    raw_x = vx.sum(axis=1) / used
    raw_y = vy.sum(axis=1) / used
    # acceleration: global step at the newer sample, terms with a
    # zero previous velocity skipped (Individual.cpp)
    acc_step = st[:, 2:]
    prev_nz = pair_ok[:, :-1] & ((vx[:, :-1] != 0) | (vy[:, :-1] != 0))
    acc_ok = pair_ok[:, 1:] & (acc_step > 0) & prev_nz
    acc_div = jnp.where(acc_ok, acc_step, 1.0)
    acc_x = jnp.where(acc_ok, (vx[:, 1:] - vx[:, :-1]) / acc_div,
                      0.0).sum(axis=1) / used
    acc_y = jnp.where(acc_ok, (vy[:, 1:] - vy[:, :-1]) / acc_div,
                      0.0).sum(axis=1) / used
    # median pair speed^2 (numpy midpoint convention)
    srt = jnp.sort(jnp.where(pair_ok, l_sq, jnp.inf), axis=1)
    lo_i = jnp.maximum((counts - 1) // 2, 0)
    hi_i = jnp.maximum(counts // 2, 0)
    med = 0.5 * (jnp.take_along_axis(srt, lo_i[:, None], 1)[:, 0]
                 + jnp.take_along_axis(srt, hi_i[:, None], 1)[:, 0])
    med = jnp.where(counts > 0, med, 0.0)
    speed = jnp.maximum(0.6, jnp.sqrt(med))
    nrm_v = jnp.hypot(raw_x, raw_y)
    dir_x = jnp.where(nrm_v > 0, raw_x / nrm_v, 0.0)
    dir_y = jnp.where(nrm_v > 0, raw_y / nrm_v, 0.0)
    nrm_a = jnp.hypot(acc_x, acc_y)
    accd_x = jnp.where(nrm_a > 0, acc_x / nrm_a, 0.0)
    accd_y = jnp.where(nrm_a > 0, acc_y / nrm_a, 0.0)
    step = st[:, -1]
    # first walk term (f' = prev, weight exactly 1 in both
    # precisions); the terms for the skipped frames of chain-broken
    # fish live in the accumulated dacc section
    ok = counts > 0
    last_x = x[:, -1]
    last_y = y[:, -1]
    est_x = jnp.where(ok, last_x + step * speed
                      * (dir_x + step * accd_x), last_x)
    est_y = jnp.where(ok, last_y + step * speed
                      * (dir_y + step * accd_y), last_y)
    if dacc is not None:
        est_x = est_x + jnp.where(ok, dacc[:, 0], 0.0)
        est_y = est_y + jnp.where(ok, dacc[:, 1], 0.0)
    need_host = bad

    # --- f32-vs-f64 estimate error bound (first order) ---------------
    # Window POSITIONS are the f32 roundings of the host's f64 blob
    # centroids (integer run sums are exact in both precisions, but
    # the sum/count DIVISION rounds differently: <= ulp32(pos)/2 per
    # coordinate), and the TIMELINE is the f32 image of the host's f64
    # timestamps. Per-pair velocity error: position packing over dt,
    # the division/clamp rounding (EPS32 * |v|), and the dt packing
    # through d v/d dt = -v/dt — each with 2x safety. The unit
    # DIRECTIONS are the hazard: the normalization jumps from 0 to a
    # full unit vector the moment a sum is nonzero, so near-cancelling
    # sums genuinely diverge between precisions; terms whose pair
    # inputs are bit-identical to the previous pair's cancel exactly
    # WITHIN each precision, leaving only the packing leak. Validated
    # with measured headroom by tests/test_match_boundary.py::
    # test_decay_est_err_bound_covers.
    pos_mag = jnp.maximum(jnp.abs(last_x), jnp.abs(last_y))
    ulp_pos = (pos_mag + 1.0) * EPS32
    ulp_t = (jnp.max(jnp.where(valid, jnp.abs(t), 0.0), axis=1)
             + 1.0) * EPS32
    dxp = x[:, 1:] - x[:, :-1]
    dyp = y[:, 1:] - y[:, :-1]
    vmag = jnp.abs(vx) + jnp.abs(vy)
    pack = (2.0 * ulp_pos[:, None] + vmag * ulp_t[:, None]) / dts
    verr = jnp.where(pair_ok, 2.0 * pack + 8.0 * EPS32 * vmag, 0.0)
    dv = verr.sum(axis=1) / used
    # acceleration terms: ((v_k - v_{k-1}) / st) errors. A term whose
    # pair inputs are bit-identical to the previous pair's cancels
    # exactly WITHIN each precision — only the pure host's packing
    # (f64 centroids and timeline behind the same f32 images) leaks
    # through, at packing scale instead of the full verr
    same = (dxp[:, 1:] == dxp[:, :-1]) & (dyp[:, 1:] == dyp[:, :-1]) \
        & (dt[:, 1:] == dt[:, :-1])
    aerr_full = (verr[:, 1:] + verr[:, :-1]
                 + 8.0 * EPS32 * (vmag[:, 1:] + vmag[:, :-1])) \
        / acc_div
    aerr_same = 2.0 * (pack[:, 1:] + pack[:, :-1]) / acc_div
    aerr = jnp.where(acc_ok, jnp.where(same, aerr_same, aerr_full),
                     0.0)
    da = aerr.sum(axis=1) / used
    vel_rel = jnp.where(dv > 0, jnp.minimum(
        2.0, 2.0 * dv / jnp.maximum(nrm_v, 1e-30)), 0.0)
    acc_rel = jnp.where(da > 0, jnp.minimum(
        2.0, 2.0 * da / jnp.maximum(nrm_a, 1e-30)), 0.0)
    v_max = jnp.sqrt(jnp.max(jnp.where(pair_ok, l_sq, 0.0), axis=1))
    dv_s = jnp.max(verr, axis=1) + 8.0 * EPS32 * v_max
    speed_rel = dv_s / speed                   # speed >= 0.6 floor
    disp = jnp.abs(step) * speed * (1.0 + jnp.abs(step))
    est_err = 2.0 * ulp_pos + jnp.where(
        ok,
        disp * (vel_rel + jnp.abs(step) * acc_rel + speed_rel
                + 16.0 * EPS32),
        0.0)
    if dacc is not None:
        est_err = est_err + jnp.where(ok, dacc[:, 2], 0.0)
    motion = dict(speed=speed, dir_x=dir_x, dir_y=dir_y,
                  accd_x=accd_x, accd_y=accd_y, counts=counts,
                  vel_rel=vel_rel, acc_rel=acc_rel,
                  speed_rel=speed_rel)
    return est_x, est_y, need_host, est_err, motion


def _greedy_pass(Pmat, valid_b, taken_f, fish_of_blob, threshold):
    """Per-blob greedy: highest-probability unused fish, first-max
    (= lowest fish id) tie-break, blobs in index order.

    Round-based exact simulation of the sequential scan (the old
    per-blob fori_loop issued B sequential argmax+scatter micro-ops —
    ~5 us each on the TPU, the dominant cost of the whole tracking
    step). Each round, every still-seeking blob proposes its best
    available fish; a fish grants to its LOWEST-index proposer, and
    grants commit only for blobs BELOW the first losing proposer
    (prefix safety: those blobs see exactly the availability the
    sequential scan would). The minimum seeking blob always wins and
    always commits, so each round retires >= 1 blob; conflict-free
    frames (the common case) resolve in one round."""
    B = Pmat.shape[1]
    F = Pmat.shape[0]
    BIG = jnp.int32(B + F + 1)
    bidx = jnp.arange(B, dtype=jnp.int32)

    def cond(state):
        return state[2]

    def body(state):
        taken, fob, _ = state
        avail = jnp.where(taken[:, None], -1.0, Pmat)  # (F, B)
        bestf = jnp.argmax(avail, axis=0).astype(jnp.int32)
        bestp = jnp.max(avail, axis=0)
        seeking = valid_b & (fob < 0) & (bestp > threshold)
        # min proposer per fish
        prop_key = jnp.where(seeking, bidx, BIG)
        min_prop = jax.ops.segment_min(
            prop_key, jnp.where(seeking, bestf, F),
            num_segments=F + 1)[:F]
        winner = seeking & (min_prop[bestf] == bidx)
        loser_min = jnp.min(jnp.where(seeking & ~winner, bidx, BIG))
        commit = winner & (bidx < loser_min)
        taken = taken | jnp.zeros(F, bool).at[
            jnp.where(commit, bestf, F)].set(True, mode="drop")
        fob = jnp.where(commit, bestf, fob)
        again = jnp.any(seeking & ~commit) & jnp.any(commit)
        return taken, fob, again

    taken, fob, _ = jax.lax.while_loop(
        cond, body, (taken_f, fish_of_blob, jnp.bool_(True)))
    return taken, fob


def _scan_impl(det: dict, times: jax.Array,
               frames_idx: jax.Array, P: TrackParams,
               carry0: dict, frames: jax.Array = None,
               background: jax.Array = None,
               split_spec=None) -> tuple[dict, dict]:
    """Scan the tracking recurrence over detected frames.

    det: stacked per-frame blob tables — dict with (T, B) arrays
    "cx", "cy" (centroids), "bcx", "bcy" (bbox centers), "recount"
    (track-threshold pixel count; cm^2 scaling applied here), "valid",
    and optionally (T, R) track-mask run tables "runs_y", "runs_x0",
    "runs_x1", "runs_slot" (slot = det row index, B for padding) used
    for the on-device HistorySplit path, plus (T, B) int bbox tables
    "bx0"/"by0"/"bx1"/"by1".

    With `frames`/`background`/`split_spec` (the fused path), history
    splits run ON DEVICE: the exact expectation
    (ops/device_split.expectation_counts) picks the blobs the host
    would split, the threshold-escalation executor splits them from
    the frame pixels, and the child pieces replace their parents at
    the parent's table position (engine._rebuild_with_splits order).
    needs_host then only flags what genuinely needs the host: marginal
    float decisions, capacity overflows, start-frame big-blob splits,
    and `huge` parents. Without split_spec, any contested frame is
    flagged (the conservative superset trigger).

    Returns (per-frame history, final carry): fish_x/fish_y/fish_seen
    (T, F), n_assigned (T,), needs_host (T,). Resume a chunk by
    passing the previous chunk's final carry as carry0.
    """
    sq = P.cm_per_pixel * P.cm_per_pixel
    cms = P.cm_per_pixel / P.max_speed
    t_delta_frame = 1.0 / P.frame_rate
    F = P.max_fish
    has_runs = "runs_slot" in det
    B = det["cx"].shape[1]
    use_dev_split = (split_spec is not None and P.do_history_split
                     and P.split_radius > 0 and has_runs
                     and frames is not None and "bx0" in det)

    def step(carry, inp):
        (cx, cy, bcx, bcy, rec, bvalid, time, frame, runs,
         flag_size, bbox, frame_img) = inp
        start_frame = carry["start_frame"]
        prev_time = carry["prev_time"]
        created = jnp.arange(F) < carry["n_fish"]
        has = (carry["last_frame"] > -(10 ** 8)) & created
        tdelta = jnp.maximum(time - carry["last_time"], 1e-6)
        # estimated positions: the decay extrapolation when
        # track_speed_decay < 1, else the last positions (matching
        # distances AND the history-split fish positions measure from
        # these — Tracker.cpp fish_positions from cache.estimated_px)
        if P.do_decay:
            est_x, est_y, dec_bad, est_err, motion = _decay_estimates(
                carry["win"], frame, P, carry["dacc"])
            est_x = jnp.where(dec_bad, carry["last_x"], est_x)
            est_y = jnp.where(dec_bad, carry["last_y"], est_y)
        else:
            est_x = carry["last_x"]
            est_y = carry["last_y"]
            dec_bad = None
            motion = None
            # est = last f32-packed centroid: packing + one compare
            est_err = 2.0 * EPS32 * (jnp.maximum(
                jnp.abs(est_x), jnp.abs(est_y)) + 1.0)
        size = rec * sq
        in_range = _in_size_ranges(size, P.size_ranges,
                                   P.size_min, P.size_max)
        at_start = frame == start_frame
        if use_dev_split:
            # with on-device splits, oversize rows are handled exactly
            # like the host (split when expected, dropped by the final
            # size filter otherwise); only the start frame's big-blob
            # split (_split_big_start) still needs the host
            needs_host = jnp.any(bvalid & (size > P.size_max)) \
                & at_start
        else:
            needs_host = jnp.any(bvalid & (size > P.size_max))
        if flag_size.shape[0]:
            # `huge` parents (engine force_set_recount path) never
            # appear as child rows: escalate to the host
            needs_host = needs_host | jnp.any(
                flag_size * sq > P.size_max * 100)

        if use_dev_split:
            # exact on-device HistorySplit: expectation picks the
            # blobs the host would split; the escalation executor
            # splits them from the frame pixels; pieces replace their
            # parents at the parent's table position
            # (engine._apply_history_split + _rebuild_with_splits)
            from .device_split import (expectation_counts,
                                       split_execute_device)
            S = split_spec
            ry, rx0, rx1, rslot = runs
            bx0i, by0i, bx1i, by1i = bbox
            recent = has & (carry["last_frame"].astype(jnp.float32)
                            >= frame - P.frame_rate * P.t_max)
            if dec_bad is not None:
                # a recent fish whose decay window needs the scalar
                # path poisons the split expectation too
                needs_host = needs_host | jnp.any(
                    recent & dec_bad & (frame != start_frame))
            # the host candidate table drops `small` rows before the
            # expectation sees it (build_candidates: keep = in-any-
            # range | big, where big reduces to size > max_hi since
            # the max range covers [max_lo, max_hi]). For <= 1 range
            # that keep-test is exactly size >= lo — emit that form so
            # the common case keeps its compiled-program cache key
            exp_ok = bvalid
            if P.has_size_filter:
                if len(P.size_ranges) <= 1:
                    exp_ok = exp_ok & (size >= P.size_min)
                else:
                    exp_ok = exp_ok & (in_range
                                       | (size > P.size_max))
            expect, marg = expectation_counts(
                est_x.astype(jnp.float32),
                est_y.astype(jnp.float32), recent,
                ry, rx0, rx1, rslot,
                bx0i.astype(jnp.float32), by0i.astype(jnp.float32),
                bx1i.astype(jnp.float32), by1i.astype(jnp.float32),
                exp_ok, jnp.float32(P.split_radius), B)
            split_rows = (expect >= 2) & exp_ok & ~at_start
            n_split = jnp.sum(split_rows)
            too_big = split_rows & ((bx1i - bx0i + 3 > S.crop_w)
                                    | (by1i - by0i + 3 > S.crop_h))
            needs_host = needs_host | (marg & ~at_start) \
                | jnp.any(too_big)
            order = jnp.argsort(
                jnp.where(split_rows, jnp.arange(B), B))
            MP = S.max_pieces
            SM = min(S.max_splits, B)
            needs_host = needs_host | (n_split > SM)
            tgts = order[:SM].astype(jnp.int32)
            live_s = jnp.arange(SM) < n_split

            def run_all(_):
                # one vmapped executor pass over the split targets
                # (lanes run the bounded escalation together; frames
                # without splits skip via the outer cond)
                rows_v, np_v, m_v = jax.vmap(
                    lambda t, e: split_execute_device(
                        frame_img, background, t, bx0i[t], by0i[t],
                        ry, rx0, rx1, rslot, e, S))(tgts, expect[tgts])
                np_v = jnp.where(live_s, np_v, 0)
                return rows_v, np_v, jnp.any(m_v & live_s)

            def run_none(_):
                return (jnp.zeros((SM, MP, 7), jnp.float32),
                        jnp.zeros((SM,), jnp.int32), jnp.bool_(False))

            if S.enabled:
                rows_v, np_v, m_any = jax.lax.cond(
                    n_split > 0, run_all, run_none, 0)
                needs_host = needs_host | m_any
            else:
                # blob_split_algorithm=none: parents drop with no
                # pieces, like engine._split_native returning []
                rows_v, np_v, _ = run_none(0)
            pr = rows_v.reshape(SM * MP, 7)
            pn = pr[:, 0]
            psafe = jnp.maximum(pn, 1.0)
            k = jnp.arange(MP)[None, :]
            # fractional sort key keeps pieces in order at the
            # parent's place (engine._rebuild_with_splits)
            p_keys = jnp.where(
                k < np_v[:, None],
                tgts[:, None].astype(jnp.float32)
                + (k + 1).astype(jnp.float32)
                / (np_v[:, None] + 2).astype(jnp.float32), jnp.inf)
            p_val = (k < np_v[:, None]).reshape(-1)
            keys = jnp.concatenate([
                jnp.where(bvalid & ~split_rows,
                          jnp.arange(B, dtype=jnp.float32), jnp.inf),
                p_keys.reshape(-1)])
            perm = jnp.argsort(keys)
            cx = jnp.concatenate([cx, pr[:, 5] / psafe])[perm]
            cy = jnp.concatenate([cy, pr[:, 6] / psafe])[perm]
            bcx = jnp.concatenate([bcx,
                                   (pr[:, 1] + pr[:, 3] + 1) * 0.5])[perm]
            bcy = jnp.concatenate([bcy,
                                   (pr[:, 2] + pr[:, 4] + 1) * 0.5])[perm]
            rec = jnp.concatenate([rec, pn])[perm]
            bvalid = jnp.concatenate(
                [bvalid & ~split_rows, p_val])[perm]
            size = rec * sq
            in_range = _in_size_ranges(size, P.size_ranges,
                                       P.size_min, P.size_max)
        bval = bvalid & in_range
        # size-filter knife-edge: the host evaluates size = recount *
        # cm^2 in f64 (recount sums are integer-exact in both
        # precisions, the PRODUCT rounds); an f32 size within a few
        # ulp of a range bound can sit on the other side of the cut
        # in f64, changing the blob set — defer like the t_max and
        # p_min bands (zero bounds are skipped: size >= 0 holds in
        # both precisions, the cut cannot flip there)
        if P.has_size_filter or P.size_max < float("inf"):
            serr = 8.0 * EPS32 * (size + 1.0)
            near_b = jnp.zeros(size.shape, bool)
            s_bounds = P.size_ranges if len(P.size_ranges) > 1 \
                else ((P.size_min, P.size_max),)
            for lo_b, hi_b in s_bounds:
                if lo_b > 0:
                    near_b = near_b | (jnp.abs(size - lo_b) <= serr)
                if hi_b < float("inf"):
                    near_b = near_b | (jnp.abs(size - hi_b) <= serr)
            needs_host = needs_host | jnp.any(near_b & bvalid)

        # on-device HistorySplit trigger (no split executor): frames
        # where >= 2 active fish estimates lie within the split radius
        # of ONE blob's track mask (a conservative superset of
        # engine._split_expectation: exact point-to-run distances
        # instead of the sampled grid, no clique resolution) are
        # flagged for the host assist which computes the true
        # expectation and split (SplitBlob escalation).
        if not use_dev_split and P.do_history_split \
                and P.split_radius > 0 and has_runs:
            ry, rx0, rx1, rslot = runs
            recent = has & (carry["last_frame"].astype(jnp.float32)
                            >= frame - P.frame_rate * P.t_max)
            if dec_bad is not None:
                needs_host = needs_host | jnp.any(
                    recent & dec_bad & (frame != start_frame))
            fx = est_x
            fy = est_y
            dxr = jnp.clip(fx[:, None], rx0[None, :].astype(jnp.float32),
                           rx1[None, :].astype(jnp.float32)) \
                - fx[:, None]
            dyr = ry[None, :].astype(jnp.float32) - fy[:, None]
            d2 = dxr * dxr + dyr * dyr          # (F, R)
            slot = jnp.minimum(rslot, B)

            def min_per_blob(row):
                return jnp.full(B + 1, jnp.inf).at[slot].min(row)

            mind2 = jax.vmap(min_per_blob)(d2)[:, :B]   # (F, B)
            # widen the radius by the f32 guard (device_split.EPS_D):
            # the carry positions are f32-packed and the distance is
            # f32 arithmetic, so an exact-boundary host decision can
            # round just outside — the trigger must stay a SUPERSET
            # of the host expectation to keep the assist contract
            r_eps = P.split_radius + 1e-3
            near = (mind2 <= r_eps * r_eps) & recent[:, None]
            contested = (near.sum(axis=0) >= 2) & bvalid
            needs_host = needs_host | (
                jnp.any(contested) & (frame != start_frame))

        # time probability (engine _caches_py)
        if P.time_prob_enabled:
            p = 1.0 - jnp.clip((tdelta - t_delta_frame) / P.t_max,
                               0.0, 1.0)
            R = carry["seen"].sum(axis=1)
            needs = has & (carry["last_frame"]
                           >= start_frame + P.minimum_frames)
            scale = jnp.where(
                needs,
                jnp.minimum(1.0, (R - 1) / P.minimum_frames + P.p_min),
                1.0)
            tprob = jnp.where(tdelta > P.t_max, 0.0,
                              (p * scale) * 0.75 + 0.25)
            tprob = jnp.where(has, tprob, 0.0)
        else:
            tprob = jnp.where(has, 1.0, 0.0)

        # the global one-frame delta divides position speeds
        # (Individual.cpp:1753); zero -> inf like the engine
        gt = time - prev_time
        global_td = jnp.where(gt > 0, gt, jnp.inf)

        # first pass over bbox centers (distances from the estimated
        # positions), active fish only
        d = jnp.hypot(bcx[None, :] - est_x[:, None],
                      bcy[None, :] - est_y[:, None])
        speed = d / global_td * cms
        usable = has & (tprob > 0) & (tdelta < P.t_max)
        if dec_bad is not None:
            # a usable fish whose estimate needs the scalar path: the
            # whole frame replays on the host
            needs_host = needs_host | jnp.any(usable & dec_bad)
        Pmat = tprob[:, None] / (1.0 + speed) ** 2
        Pmat = jnp.where(usable[:, None], Pmat, 0.0)

        # --- f32-vs-f64 probability error bound (first order) ---------
        # A non-flagged frame is decided on-device in f32; the host
        # replay recomputes the SAME formulas in f64 from the same
        # carry bits (device_engine._sync_helper_state promotes the
        # carry), so the divergence is the f32 arithmetic itself plus
        # the decay-estimate chain's amplification (est_err). Detection
        # tables are exact in both precisions (integer run sums, see
        # ops/runcc). |dp/dd| = 2 tprob (cms/gtd) / (1+speed)^3; tprob
        # transfers tdelta error with slope 0.75/t_max. Validated with
        # measured headroom by tests/test_match_boundary.py.
        inv_gtd = jnp.where(jnp.isfinite(global_td),
                            1.0 / global_td, 0.0)
        td_err = 4.0 * EPS32 * (jnp.abs(time) + 1.0)
        tprob_err = jnp.where(
            has, (0.75 / P.t_max) * td_err + 8.0 * EPS32 * tprob, 0.0)
        d_err = est_err[:, None] + 4.0 * EPS32 * (
            d + jnp.maximum(jnp.abs(bcx), jnp.abs(bcy))[None, :] + 1.0)
        speed_err = d_err * cms * inv_gtd \
            + speed * (td_err * inv_gtd + 4.0 * EPS32)
        p_err = (2.0 * tprob[:, None] * speed_err / (1.0 + speed) ** 3
                 + tprob_err[:, None] / (1.0 + speed) ** 2
                 + 8.0 * EPS32 * Pmat)
        p_err = jnp.where(usable[:, None] & bval[None, :], p_err, 0.0)
        # the usable/inactive cuts compare tdelta against t_max: a
        # host-f64 tdelta on the other side changes the edge set
        needs_host = needs_host | jnp.any(
            has & (jnp.abs(tdelta - P.t_max) <= td_err))

        fob = jnp.full(bval.shape, -1, jnp.int32)
        if P.match_optimal:
            # automatic/hungarian/tree: optimal max-sum assignment
            # (per-clique optima compose, so the auction solves the
            # whole frame); near-ties/uncertified frames defer
            from .device_match import (GAP_GUARD, TIE_GUARD,
                                       auction_match,
                                       edge_boundary_marginal)
            edge_ok = (Pmat > P.p_min) & usable[:, None] \
                & bval[None, :]
            # an alternative matching the host's f64 values prefer
            # shifts each component edge by <= max p_err: widen the
            # per-edge tightness/cancellation bands by 2x that, the
            # same per-edge-tight approximation the base TIE_GUARD
            # already makes (a full budget-concentration bound would
            # multiply by the component length and defers entire
            # crowded scenes — measured 28% -> 85% on a 24-fish
            # overlap-heavy stress scene)
            pad = 2.0 * jnp.max(jnp.where(edge_ok, p_err, 0.0))
            fob, marg_m = auction_match(Pmat, edge_ok,
                                        gap_guard=GAP_GUARD,
                                        tie_guard=TIE_GUARD + pad)
            marg_m = marg_m | edge_boundary_marginal(
                Pmat, usable, bval, P.p_min, p_err=p_err)
            needs_host = needs_host | marg_m
        else:
            _, fob = _greedy_pass(Pmat, bval, ~usable, fob, P.p_min)
            # the greedy host twin runs the same first-max-per-blob
            # scan in f64: defer frames where the f32 p_min edge set
            # or any per-blob ordering could differ
            from .device_match import edge_boundary_marginal
            cand = usable[:, None] & bval[None, :] \
                & (Pmat > P.p_min - p_err)
            col_err = jnp.max(jnp.where(cand, p_err, 0.0), axis=0)
            vals = jnp.sort(jnp.where(cand, Pmat, -jnp.inf), axis=0)
            adj_tie = (vals[1:] - vals[:-1]) <= 2.0 * col_err[None, :]
            needs_host = needs_host | jnp.any(
                jnp.isfinite(vals[:-1]) & adj_tie) \
                | edge_boundary_marginal(Pmat, usable, bval, P.p_min,
                                         p_err=p_err)
        n_first = (fob >= 0).sum()
        first_fob = fob  # first-pass assignments (real probabilities)

        # second pass: reactivation over centroids (engine
        # _reactivate_py formula, unclamped)
        inactive = created & ((~has) | (tdelta >= P.t_max))
        sqd = (cx[None, :] - carry["last_x"][:, None]) ** 2 \
            + (cy[None, :] - carry["last_y"][:, None]) ** 2
        pre = jnp.where(sqd > 0, 1.0 / sqd / global_td, 1.0 / global_td)
        pre = jnp.where(jnp.asarray(global_td) <= 0, 1.0, pre)
        pre = P.p_min + pre * (1.0 - P.p_min)
        pre = jnp.where((carry["n_basic"] > 0)[:, None], pre, P.p_min)
        pre = jnp.where(inactive[:, None], pre, -1.0)
        free = bval & (fob < 0)
        _, fob = _greedy_pass(pre, free, ~inactive, fob, 0.0)
        n_react = (fob >= 0).sum() - n_first
        # reactivation knife-edges: the host twin evaluates the same
        # first-max scan in f64 — over its OWN f64 centroids, of which
        # the carry holds the f32 roundings (<= ulp(pos)/2 per
        # coordinate). Transfer slopes: d pre/d sqd = -(pre-p_min)/sqd
        # with |d sqd| <= 4 dist ulp_pos, d pre/d gtd = -(pre-p_min)/
        # gtd; a device-f32 sqd of EXACTLY zero is additionally
        # discontinuous (the host's nonzero sqd takes the 1/sqd
        # branch), so such frames always defer.
        pos_err = (jnp.maximum(jnp.abs(carry["last_x"]),
                               jnp.abs(carry["last_y"])) + 1.0) * EPS32
        sq_rel = jnp.where(sqd > 0,
                           4.0 * pos_err[:, None]
                           / jnp.sqrt(jnp.maximum(sqd, 1e-30)), 0.0)
        pre_err = 8.0 * EPS32 * jnp.abs(pre) \
            + jnp.maximum(pre - P.p_min, 0.0) \
            * (4.0 * EPS32 + td_err * inv_gtd + sq_rel)
        cand_r = inactive[:, None] & free[None, :]
        needs_host = needs_host | jnp.any(cand_r & (sqd <= 0))
        colr_err = jnp.max(jnp.where(cand_r, pre_err, 0.0), axis=0)
        vals_r = jnp.sort(jnp.where(cand_r, pre, -jnp.inf), axis=0)
        tie_r = (vals_r[1:] - vals_r[:-1]) <= 2.0 * colr_err[None, :]
        needs_host = needs_host | jnp.any(
            jnp.isfinite(vals_r[:-1]) & tie_r)

        # creation: remaining free blobs claim new ids in blob order
        still_free = bval & (fob < 0)
        order = jnp.cumsum(still_free.astype(jnp.int32)) - 1
        new_id = carry["n_fish"] + order
        create = still_free & (new_id < F)
        fob = jnp.where(create, new_id, fob)
        n_fish = jnp.minimum(jnp.asarray(F, jnp.int32),
                             carry["n_fish"] + create.sum(
                                 dtype=jnp.int32))

        # scatter per-fish updates (centroid positions)
        fish_idx = jnp.where(fob >= 0, fob, F)  # F = drop slot
        fx = jnp.zeros(F + 1).at[fish_idx].set(cx)[:F]
        fy = jnp.zeros(F + 1).at[fish_idx].set(cy)[:F]
        got = jnp.zeros(F + 1, bool).at[fish_idx].set(fob >= 0)[:F]
        # per-fish det-table row of the assigned blob (posture + pv
        # host-posture consumers). In the split path rows are the
        # PERMUTED concat table: map back to the original det row;
        # split children (pre-concat index >= B) have no run-table
        # entry -> fish_child
        Bfin = bval.shape[0]
        if use_dev_split:
            orig_of_b = perm.astype(jnp.int32)
        else:
            orig_of_b = jnp.arange(Bfin, dtype=jnp.int32)
        fish_row = jnp.full(F + 1, -1, jnp.int32).at[fish_idx].set(
            jnp.where(fob >= 0, orig_of_b, -1))[:F]
        fish_child = jnp.zeros(F + 1, bool).at[fish_idx].set(
            (fob >= 0) & (orig_of_b >= B))[:F]
        # assigned first-pass probability per fish (-1 for
        # reactivations/creations, matching the host Tracker's
        # prob-unknown sentinel): feeds the archive's
        # track_trusted_probability tracklet break
        bi = jnp.arange(Bfin)
        pvals_b = jnp.where(
            first_fob >= 0,
            Pmat[jnp.clip(first_fob, 0, F - 1), bi], -1.0)
        fish_prob = jnp.full(F + 1, -1.0).at[fish_idx].set(
            jnp.where(first_fob >= 0, pvals_b, -1.0))[:F]
        if P.trusted_p > 0:
            # a committed probability within p_err of the trusted cut
            # could break the archive tracklet differently under the
            # host's f64 — defer the frame (rare: the cut sits far
            # below typical committed probabilities)
            perr_b = jnp.where(
                first_fob >= 0,
                p_err[jnp.clip(first_fob, 0, F - 1), bi], 0.0)
            needs_host = needs_host | jnp.any(
                (first_fob >= 0)
                & (jnp.abs(pvals_b - P.trusted_p) <= perr_b))

        seen = jnp.concatenate(
            [carry["seen"][:, 1:], got[:, None]], axis=1)
        new_carry = dict(
            last_x=jnp.where(got, fx, carry["last_x"]),
            last_y=jnp.where(got, fy, carry["last_y"]),
            last_time=jnp.where(got, time, carry["last_time"]),
            last_frame=jnp.where(got, frame,
                                 carry["last_frame"]).astype(jnp.int32),
            n_basic=carry["n_basic"] + got.astype(jnp.int32),
            seen=seen, n_fish=n_fish,
            start_frame=carry["start_frame"],
            prev_time=time.astype(jnp.float32))
        if P.do_decay:
            entry = jnp.stack([
                jnp.broadcast_to(
                    jnp.asarray(frame, jnp.float32), (F,)),
                fx.astype(jnp.float32), fy.astype(jnp.float32),
                jnp.broadcast_to(jnp.asarray(time, jnp.float32), (F,)),
                jnp.broadcast_to(
                    jnp.asarray(time - prev_time, jnp.float32),
                    (F,))], axis=1)
            shifted = jnp.concatenate(
                [carry["win"][:, 1:], entry[:, None, :]], axis=1)
            new_carry["win"] = jnp.where(got[:, None, None], shifted,
                                         carry["win"])
            # chain-walk accumulation (window_estimate_scalar's loop,
            # cache_batch.py:268-277, one term per unassigned frame):
            # at the end of step f an unassigned fish adds the f'=f
            # term w(j) * step * speed * (dir + step * accd) with
            # j = f - prev + 1; assignment resets the accumulator (the
            # next frame's walk restarts at the new window's st[-1]
            # first term). The error column accumulates the same
            # first-order bound the one-step estimate uses, scaled by
            # the term's weight*step displacement, plus rounding of
            # the accumulation adds themselves.
            lam = jnp.float32(P.decay_lambda)
            g = (time - prev_time).astype(jnp.float32)
            j = (frame - carry["last_frame"] + 1).astype(jnp.float32)
            w = (1.0 + lam) / (1.0 + lam * jnp.maximum(1.0, j))
            kx = w * g * motion["speed"] * (motion["dir_x"]
                                            + g * motion["accd_x"])
            ky = w * g * motion["speed"] * (motion["dir_y"]
                                            + g * motion["accd_y"])
            disp_t = jnp.abs(w * g) * motion["speed"] \
                * (1.0 + jnp.abs(g))
            kerr = disp_t * (motion["vel_rel"]
                             + jnp.abs(g) * motion["acc_rel"]
                             + motion["speed_rel"] + 16.0 * EPS32) \
                + 8.0 * EPS32 * (jnp.abs(kx) + jnp.abs(ky) + 1e-30)
            can = has & (motion["counts"] > 0) & ~got
            dacc = carry["dacc"]
            new_dacc = jnp.stack([
                jnp.where(can, dacc[:, 0] + kx, dacc[:, 0]),
                jnp.where(can, dacc[:, 1] + ky, dacc[:, 1]),
                jnp.where(can, dacc[:, 2] + kerr, dacc[:, 2])], axis=1)
            new_carry["dacc"] = jnp.where(got[:, None],
                                          jnp.zeros((F, 3)), new_dacc)
        out = dict(fish_x=new_carry["last_x"],
                   fish_y=new_carry["last_y"], fish_seen=got,
                   fish_row=fish_row, fish_child=fish_child,
                   fish_prob=fish_prob,
                   n_assigned=n_first + n_react,
                   needs_host=needs_host,
                   # packed per-frame carry: the splice replay resumes
                   # from the row before a flagged frame without a
                   # second scan (and without extra transfers — it
                   # rides the one packed result array)
                   carry_vec=_carry_to_vec_jnp(new_carry))
        return new_carry, out

    if has_runs:
        runs_in = (det["runs_y"], det["runs_x0"], det["runs_x1"],
                   det["runs_slot"])
    else:
        z = jnp.zeros(times.shape + (0,), jnp.int32)
        runs_in = (z, z, z, z)
    flag_in = det.get("flag_size")
    if flag_in is None:
        flag_in = jnp.zeros(times.shape + (0,), jnp.float32)
    if use_dev_split:
        bbox_in = (det["bx0"], det["by0"], det["bx1"], det["by1"])
        frames_in = frames
    else:
        zb = jnp.zeros(times.shape + (0,), jnp.int32)
        bbox_in = (zb, zb, zb, zb)
        frames_in = jnp.zeros(times.shape + (1, 1), jnp.uint8)
    inputs = (det["cx"], det["cy"], det["bcx"], det["bcy"],
              det["recount"], det["valid"], times, frames_idx,
              runs_in, flag_in, bbox_in, frames_in)
    final, hist = jax.lax.scan(step, carry0, inputs)
    hist["n_fish"] = final["n_fish"]
    return hist, final


_track_scan_carry = partial(
    jax.jit, static_argnames=("P", "split_spec"))(_scan_impl)


def launch_resilient(fn, *args, **kw):
    """Call a jitted launch, retrying once through jax.clear_caches()
    on executable corruption. The remote-compile relay backend of
    this deployment corrupts a program's live executable once a
    second near-identical shape of the same program is compiled —
    subsequent executions fail with a buffer-count mismatch
    ("Execution supplied 2 buffers but compiled program expected 3"
    on CPU) or INVALID_ARGUMENT at transfer on the TPU; a fresh
    compile after clear_caches recovers deterministically (measured).
    track/device_engine's packed path wraps its launches through this
    same guard."""
    for attempt in range(3):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 - backend-specific
            msg = str(e)
            retryable = "buffers" in msg or "INVALID_ARGUMENT" in msg
            if attempt == 2 or not retryable:
                raise
            jax.clear_caches()


def track_scan(det: dict, times: jax.Array, frames_idx: jax.Array,
               P: TrackParams, carry0: dict = None, frames=None,
               background=None, split_spec=None) -> dict:
    """Public scan entry: builds the initial carry when none is given
    and attaches the final carry under "final_carry" (resume support
    for the splice replay; see track/device_engine.py)."""
    if carry0 is None:
        carry0 = _init_carry(P, frames_idx[0], times[0])
    hist, final = launch_resilient(
        _track_scan_carry, det, times, frames_idx, P, carry0,
        frames, background, split_spec)
    hist["final_carry"] = final
    return hist


# ---------------------------------------------------------------------------
# packed transfer layer: the production host<->device link moves ONE
# array per direction per chunk. The accelerator tunnel on this class
# of deployment has multi-second PER-TRANSFer latency; a dict of ~17
# small arrays costs ~50s while the same bytes in one array move in
# one round trip (measured on the axon relay, round 3).
# ---------------------------------------------------------------------------

def carry_vec_size(P: TrackParams) -> int:
    F = P.max_fish
    # posture: trailing (F, 2) previous-midline-direction section
    return _track_vec_size(P) + (2 * F if P.do_posture else 0)


def _track_vec_size(P: TrackParams) -> int:
    """Tracking-scan carry width (without the posture section)."""
    F = P.max_fish
    base = 5 * F + F * P.frame_rate + 3
    # decay: trailing (F, WIN, 5) motion-window section + the (F, 3)
    # accumulated chain-walk section [dx, dy, err]
    return base + ((5 * DECAY_WIN + 3) * F if P.do_decay else 0)


def _carry_to_vec_jnp(c: dict) -> jax.Array:
    """In-graph counterpart of carry_to_vec (same layout)."""
    parts = [
        c["last_x"].astype(jnp.float32),
        c["last_y"].astype(jnp.float32),
        c["last_time"].astype(jnp.float32),
        c["last_frame"].astype(jnp.float32),
        c["n_basic"].astype(jnp.float32),
        c["seen"].astype(jnp.float32).reshape(-1),
        jnp.stack([c["n_fish"].astype(jnp.float32),
                   c["start_frame"].astype(jnp.float32),
                   c["prev_time"].astype(jnp.float32)])]
    if "win" in c:
        parts.append(c["win"].astype(jnp.float32).reshape(-1))
        parts.append(c["dacc"].astype(jnp.float32).reshape(-1))
    return jnp.concatenate(parts)


def carry_to_vec(carry) -> np.ndarray:
    """Host-side carry dict (numpy/jax) -> 1-D float32 vector."""
    c = {k: np.asarray(v) for k, v in carry.items()}
    parts = [
        c["last_x"].astype(np.float32),
        c["last_y"].astype(np.float32),
        c["last_time"].astype(np.float32),
        c["last_frame"].astype(np.float32),
        c["n_basic"].astype(np.float32),
        c["seen"].astype(np.float32).reshape(-1),
        np.asarray([float(c["n_fish"]), float(c["start_frame"]),
                    float(c["prev_time"])], np.float32)]
    if "win" in c:
        parts.append(c["win"].astype(np.float32).reshape(-1))
        parts.append(np.asarray(
            c.get("dacc", np.zeros((len(c["last_x"]), 3))),
            np.float32).reshape(-1))
    if "posture_dir" in c:
        parts.append(c["posture_dir"].astype(np.float32).reshape(-1))
    return np.concatenate(parts)


def carry_from_vec_np(vec: np.ndarray, P: TrackParams) -> dict:
    """Host-side inverse of carry_to_vec."""
    F = P.max_fish
    W = P.frame_rate
    o = 0

    def take(n):
        nonlocal o
        out = vec[o:o + n]
        o += n
        return out

    out = dict(
        last_x=take(F).astype(np.float64),
        last_y=take(F).astype(np.float64),
        last_time=take(F).astype(np.float64),
        last_frame=take(F).astype(np.int64),
        n_basic=take(F).astype(np.int64),
        seen=take(F * W).reshape(F, W) > 0.5,
        n_fish=int(vec[o]), start_frame=int(vec[o + 1]),
        prev_time=float(vec[o + 2]))
    o += 3
    if P.do_decay:
        out["win"] = take(5 * DECAY_WIN * F) \
            .reshape(F, DECAY_WIN, 5).astype(np.float64)
        out["dacc"] = take(3 * F).reshape(F, 3).astype(np.float64)
    if P.do_posture:
        out["posture_dir"] = take(2 * F).reshape(F, 2) \
            .astype(np.float64)
    return out


def _carry_from_vec(vec: jax.Array, P: TrackParams) -> dict:
    F = P.max_fish
    W = P.frame_rate
    o = 0

    def take(n):
        nonlocal o
        out = vec[o:o + n]
        o += n
        return out

    lx = take(F)
    ly = take(F)
    lt = take(F)
    lf = take(F)
    nb = take(F)
    seen = take(F * W).reshape(F, W)
    tail = take(3)
    out = dict(
        last_x=lx, last_y=ly, last_time=lt,
        last_frame=lf.astype(jnp.int32),
        n_basic=nb.astype(jnp.int32), seen=seen > 0.5,
        n_fish=tail[0].astype(jnp.int32),
        start_frame=tail[1].astype(jnp.int32),
        prev_time=tail[2])
    if P.do_decay:
        out["win"] = take(5 * DECAY_WIN * F).reshape(F, DECAY_WIN, 5)
        out["dacc"] = take(3 * F).reshape(F, 3)
    return out


def _pack_result(hist: dict, final: dict, overflow,
                 P: TrackParams = None) -> jax.Array:
    T, F = hist["fish_x"].shape
    parts = [
        hist["fish_x"].astype(jnp.float32).reshape(-1),
        hist["fish_y"].astype(jnp.float32).reshape(-1),
        hist["fish_seen"].astype(jnp.float32).reshape(-1),
        hist["fish_row"].astype(jnp.float32).reshape(-1),
        hist["fish_child"].astype(jnp.float32).reshape(-1),
        hist["fish_prob"].astype(jnp.float32).reshape(-1),
        hist["n_assigned"].astype(jnp.float32),
        (hist["needs_host"].astype(jnp.float32)
         + 2.0 * overflow.astype(jnp.float32)),
    ]
    if P is not None and P.do_posture:
        parts += [
            hist["p_len"].astype(jnp.float32).reshape(-1),
            hist["p_ang"].astype(jnp.float32).reshape(-1),
            hist["p_ok"].astype(jnp.float32).reshape(-1),
        ]
        carry = jnp.concatenate(
            [hist["carry_vec"], hist["p_dir"].reshape(T, 2 * F)],
            axis=1)
    else:
        carry = hist["carry_vec"]
    parts.append(carry.reshape(-1))
    return jnp.concatenate(parts)


def unpack_result(vec: np.ndarray, T: int, P: TrackParams):
    """1-D result vector -> (hist dict numpy, per-frame carry rows
    (T, carry_vec_size))."""
    F = P.max_fish
    o = 0

    def take(n):
        nonlocal o
        out = vec[o:o + n]
        o += n
        return out

    fx = take(T * F).reshape(T, F).astype(np.float64)
    fy = take(T * F).reshape(T, F).astype(np.float64)
    seen = take(T * F).reshape(T, F) > 0.5
    fish_row = take(T * F).reshape(T, F).astype(np.int64)
    fish_child = take(T * F).reshape(T, F) > 0.5
    fish_prob = take(T * F).reshape(T, F).astype(np.float64)
    n_assigned = take(T).astype(np.int64)
    flags = take(T)
    hist = dict(fish_x=fx, fish_y=fy, fish_seen=seen,
                fish_row=fish_row, fish_child=fish_child,
                fish_prob=fish_prob,
                n_assigned=n_assigned,
                needs_host=(flags % 2) >= 1,
                detect_overflow=flags >= 2)
    if P.do_posture:
        hist["p_len"] = take(T * F).reshape(T, F).astype(np.float64)
        hist["p_ang"] = take(T * F).reshape(T, F).astype(np.float64)
        hist["p_ok"] = take(T * F).reshape(T, F) > 0.5
    cs = carry_vec_size(P)
    carry_rows = take(T * cs).reshape(T, cs)
    hist["n_fish"] = np.int32(carry_rows[-1, 5 * F
                                         + F * P.frame_rate])
    return hist, carry_rows


def _aux_split(aux: jax.Array, T: int, P: TrackParams):
    """aux -> (tracking carry dict, posture_dir (F, 2) or None,
    times, frame indices). The posture section is not part of the
    tracking scan's carry — the posture scan consumes it."""
    F = P.max_fish
    base = _track_vec_size(P)
    cs = carry_vec_size(P)
    carry0 = _carry_from_vec(aux[:base], P)
    pdir0 = aux[base:cs].reshape(F, 2) if P.do_posture else None
    times = aux[cs:cs + T]
    fidx = aux[cs + T:cs + 2 * T].astype(jnp.int32)
    return carry0, pdir0, times, fidx


def make_aux(carry_vec: np.ndarray, times, frames_idx) -> np.ndarray:
    return np.concatenate([
        np.asarray(carry_vec, np.float32),
        np.asarray(times, np.float32),
        np.asarray(frames_idx, np.float32)])


@partial(jax.jit, static_argnames=("P", "B", "R"))
def scan_packed(det_packed: jax.Array, aux: jax.Array,
                P: TrackParams, B: int, R: int) -> jax.Array:
    """One-array-in / one-array-out scan for host-built det tables
    (the pv re-track path). det_packed is (T, 6B [+4R]) float32:
    [cx, cy, bcx, bcy, recount, valid (+runs_y, x0, x1, slot)];
    aux = make_aux(carry_vec, times, frame indices)."""
    T = det_packed.shape[0]
    det = dict(
        cx=det_packed[:, 0 * B:1 * B],
        cy=det_packed[:, 1 * B:2 * B],
        bcx=det_packed[:, 2 * B:3 * B],
        bcy=det_packed[:, 3 * B:4 * B],
        recount=det_packed[:, 4 * B:5 * B],
        valid=det_packed[:, 5 * B:6 * B] > 0.5)
    if R:
        base = 6 * B
        det.update(
            runs_y=det_packed[:, base:base + R].astype(jnp.int32),
            runs_x0=det_packed[:, base + R:base + 2 * R].astype(
                jnp.int32),
            runs_x1=det_packed[:, base + 2 * R:base + 3 * R].astype(
                jnp.int32),
            runs_slot=det_packed[:, base + 3 * R:base + 4 * R].astype(
                jnp.int32))
    carry0, pdir0, times, fidx = _aux_split(aux, T, P)
    hist, final = _scan_impl(det, times, fidx, P, carry0)
    if P.do_posture:
        # no pixel data on the pv path: posture runs host-side in
        # DeviceTracker._flush; the carry's posture section rides
        # through unchanged and the per-frame fields stay empty
        F = P.max_fish
        hist["p_len"] = jnp.zeros((T, F), jnp.float32)
        hist["p_ang"] = jnp.zeros((T, F), jnp.float32)
        hist["p_ok"] = jnp.zeros((T, F), bool)
        hist["p_dir"] = jnp.broadcast_to(pdir0[None], (T, F, 2))
    return _pack_result(hist, final, jnp.zeros(T, bool), P)


def _posture_scan(frames, background, det, hist, pdir0,
                  P: TrackParams, spec):
    """Posture pass over the tracking scan's assignments (the host
    engine's _run_posture_batch). All (frame, fish) lanes run through
    ONE batched chain (ops/device_posture.posture_lanes_batched) — the
    while-loop iteration overhead on the target backend is lane-count
    independent, so batching the chunk amortizes it by T — and the
    frame-sequential previous-midline-direction carry reduces to an
    elementwise variant select (posture_select_scan). Lanes the device
    cannot do exactly (split children without run tables, crops beyond
    the caps, trace overflows) escalate the FRAME to needs_host — the
    standard assist replays tracking + posture on the host."""
    from .device_posture import (posture_lanes_batched,
                                 posture_select_scan)

    B = det["bx0"].shape[1]
    CW, CH = spec.crop_w, spec.crop_h
    f_row = hist["fish_row"]                      # (T, F)
    assigned = f_row >= 0
    bi = jnp.clip(f_row, 0, B - 1).astype(jnp.int32)
    bx0 = jnp.take_along_axis(det["bx0"], bi, axis=1)
    by0 = jnp.take_along_axis(det["by0"], bi, axis=1)
    bx1 = jnp.take_along_axis(det["bx1"], bi, axis=1)
    by1 = jnp.take_along_axis(det["by1"], bi, axis=1)
    too_big = (bx1 - bx0 + 3 > CW) | (by1 - by0 + 3 > CH)
    active = assigned & ~hist["fish_child"] & ~too_big
    out = posture_lanes_batched(
        frames, background, bi, bx0, by0,
        det["runs_y"], det["runs_x0"], det["runs_x1"],
        det["runs_slot"], active, spec)
    p_len, p_ang, p_ok, p_dir, _ = posture_select_scan(
        out, pdir0.astype(jnp.float32), spec)
    host = jnp.any(assigned & (hist["fish_child"] | too_big
                               | out["overflow"]), axis=1)
    hist.update(p_len=p_len, p_ang=p_ang, p_ok=p_ok, p_dir=p_dir)
    hist["needs_host"] = hist["needs_host"] | host
    return hist


def _fused_impl(frames, background, aux, P: TrackParams,
                split_spec=None, posture_spec=None, **kw):
    from .runcc import detect_batch_runs

    out = detect_batch_runs(frames, background, **kw)
    det = detections_from_runcc(out, P)
    carry0, pdir0, times, fidx = _aux_split(aux, frames.shape[0], P)
    hist, final = _scan_impl(det, times, fidx, P, carry0,
                             frames=frames, background=background,
                             split_spec=split_spec)
    if P.do_posture:
        if posture_spec is not None and posture_spec.enabled \
                and "runs_slot" in det and "bx0" in det:
            hist = _posture_scan(frames, background, det, hist,
                                 pdir0, P, posture_spec)
        else:
            T = frames.shape[0]
            F = P.max_fish
            hist["p_len"] = jnp.zeros((T, F), jnp.float32)
            hist["p_ang"] = jnp.zeros((T, F), jnp.float32)
            hist["p_ok"] = jnp.zeros((T, F), bool)
            hist["p_dir"] = jnp.broadcast_to(pdir0[None], (T, F, 2))
            # posture requested but not runnable on device: every
            # frame with an assignment needs the host
            hist["needs_host"] = hist["needs_host"] | jnp.any(
                hist["fish_row"] >= 0, axis=1)
    return _pack_result(hist, final, out["overflow"], P)


_fused_jit_cache: dict = {}


def _fused_stage1(frames, background, aux, P: TrackParams,
                  split_spec=None, **kw):
    """Detect + tracking scan only; returns the device-resident
    intermediates the posture stage consumes."""
    from .runcc import detect_batch_runs

    out = detect_batch_runs(frames, background, **kw)
    det = detections_from_runcc(out, P)
    carry0, pdir0, times, fidx = _aux_split(aux, frames.shape[0], P)
    hist, final = _scan_impl(det, times, fidx, P, carry0,
                             frames=frames, background=background,
                             split_spec=split_spec)
    return det, hist, pdir0, out["overflow"]


def _fused_stage2(frames, background, det, hist, pdir0, overflow,
                  P: TrackParams, posture_spec):
    """Posture scan over stage 1's assignments + result packing."""
    T = frames.shape[0]
    F = P.max_fish
    if posture_spec is not None and posture_spec.enabled \
            and "runs_slot" in det and "bx0" in det:
        hist = _posture_scan(frames, background, det, hist, pdir0, P,
                             posture_spec)
    else:
        hist["p_len"] = jnp.zeros((T, F), jnp.float32)
        hist["p_ang"] = jnp.zeros((T, F), jnp.float32)
        hist["p_ok"] = jnp.zeros((T, F), bool)
        hist["p_dir"] = jnp.broadcast_to(pdir0[None], (T, F, 2))
        hist["needs_host"] = hist["needs_host"] | jnp.any(
            hist["fish_row"] >= 0, axis=1)
    return _pack_result(hist, None, overflow, P)


def fused_scan_packed(frames, background, aux,
                      P: TrackParams, split_spec=None,
                      posture_spec=None, two_stage: bool = False,
                      **kw) -> jax.Array:
    """Fused detect+scan with one packed output array (the raw-frames
    product path: the host->device transfers are the frame batch and
    one aux vector). split_spec (ops/device_split.SplitSpec) turns on
    the in-graph HistorySplit executor; posture_spec
    (ops/device_posture.PostureSpec) appends the posture scan.

    two_stage: compile the tracking scan and the posture scan as TWO
    programs with device-resident intermediates (no extra transfers —
    jit outputs stay on device). This counters the composed-program
    pathology documented in ROUND3_NOTES.md ("Infrastructure finding:
    composed-program slowdown"): the backend's loop optimizer
    rematerializes upstream fusions inside the posture while-loop
    bodies when everything compiles as one program; a program boundary
    pins the intermediates as buffers instead."""
    if two_stage and P.do_posture:
        key = ("2s", P, split_spec, posture_spec,
               tuple(sorted(kw.items())))
        fns = _fused_jit_cache.get(key)
        if fns is None:
            f1 = jax.jit(partial(_fused_stage1, P=P,
                                 split_spec=split_spec, **kw))
            f2 = jax.jit(partial(_fused_stage2, P=P,
                                 posture_spec=posture_spec))
            fns = _fused_jit_cache[key] = (f1, f2)
        f1, f2 = fns
        det, hist, pdir0, overflow = f1(frames, background, aux)
        return f2(frames, background, det, hist, pdir0, overflow)
    key = (P, split_spec, posture_spec, tuple(sorted(kw.items())))
    fn = _fused_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(partial(_fused_impl, P=P, split_spec=split_spec,
                             posture_spec=posture_spec, **kw))
        _fused_jit_cache[key] = fn
    return fn(frames, background, aux)


def detections_from_runcc(out: dict, P: TrackParams = None) -> dict:
    """Adapt detect_batch_runs output to track_scan's blob tables.

    With a track threshold, the tracked rows are the track-threshold
    CHILDREN (pixel::threshold_blob components) — for all-pass parents
    the child is geometrically identical to its parent, and for
    partially-passing parents the engine's candidate table holds the
    children too (engine.build_candidates `slow` path), so the child
    table reproduces the host table row-for-row except `huge` parents
    (count > 100x the size maximum, force_set_recount semantics) —
    those raise the needs_host flag via `flag_size` instead.
    """
    det = out["det"]
    n = det["count"]
    pvalid = (jnp.arange(n.shape[1])[None, :]
              < det["n_blobs"][:, None]) & (n > 0)
    sq = (P.cm_per_pixel * P.cm_per_pixel) if P is not None else 1.0

    if "child" in out:
        ch = out["child"]
        cn = ch["count"]
        cvalid = (jnp.arange(cn.shape[1])[None, :]
                  < ch["n_blobs"][:, None]) & (cn > 0)
        if P is not None and (P.detect_size_min > 0
                              or P.detect_size_max != float("inf")):
            psize = n * sq
            pok = pvalid & _in_size_ranges(
                psize, P.detect_size_ranges,
                P.detect_size_min, P.detect_size_max)
            Bp = n.shape[1]
            parent = jnp.minimum(ch["parent"], Bp)
            pok_pad = jnp.concatenate(
                [pok, jnp.zeros((pok.shape[0], 1), bool)], axis=1)
            cvalid = cvalid & jnp.take_along_axis(pok_pad, parent,
                                                  axis=1)
        safe = jnp.maximum(cn, 1)
        d = dict(
            cx=ch["sum_x"] / safe, cy=ch["sum_y"] / safe,
            bcx=(ch["x0"] + ch["x1"] + 1) * 0.5,
            bcy=(ch["y0"] + ch["y1"] + 1) * 0.5,
            bx0=ch["x0"].astype(jnp.int32),
            by0=ch["y0"].astype(jnp.int32),
            bx1=ch["x1"].astype(jnp.int32),
            by1=ch["y1"].astype(jnp.int32),
            recount=cn, valid=cvalid)
        if "child_runs" in out:
            cr = out["child_runs"]
            d.update(runs_y=cr["y"], runs_x0=cr["x0"],
                     runs_x1=cr["x1"], runs_slot=cr["slot"])
        # huge parents never reach the child rows in the host table:
        # flag them (scan: any flag_size*cm^2 > size_max*100)
        if P is not None and P.has_size_filter:
            d["flag_size"] = jnp.where(pvalid, n, 0)
        return d

    if P is not None and (P.detect_size_min > 0
                          or P.detect_size_max != float("inf")):
        # host pipeline drops out-of-range detections before the
        # tracker ever sees them (pipeline._detect_frame)
        pvalid = pvalid & _in_size_ranges(
            n * sq, P.detect_size_ranges,
            P.detect_size_min, P.detect_size_max)
    safe = jnp.maximum(n, 1)
    d = dict(
        cx=det["sum_x"] / safe, cy=det["sum_y"] / safe,
        bcx=(det["x0"] + det["x1"] + 1) * 0.5,
        bcy=(det["y0"] + det["y1"] + 1) * 0.5,
        bx0=det["x0"].astype(jnp.int32),
        by0=det["y0"].astype(jnp.int32),
        bx1=det["x1"].astype(jnp.int32),
        by1=det["y1"].astype(jnp.int32),
        # runcc emits track_count only when a track threshold runs
        # (track_background_subtraction); size-filter on the plain
        # detect count otherwise, like the host engine
        recount=det.get("track_count", n), valid=pvalid)
    if "det_runs" in out:
        dr = out["det_runs"]
        d.update(runs_y=dr["y"], runs_x0=dr["x0"],
                 runs_x1=dr["x1"], runs_slot=dr["slot"])
    return d


def _detect_kwargs(settings, caps) -> dict:
    kw = dict(
        detect_threshold=int(settings["detect_threshold"]),
        detect_absolute=bool(settings["detect_threshold_is_absolute"]),
        track_threshold=int(settings["track_threshold"])
        if settings["track_background_subtraction"] else 0,
        track_absolute=bool(settings["track_threshold_is_absolute"]))
    kw.update(caps)
    return kw


def default_split_spec(settings, P: TrackParams = None,
                       split_caps: dict = None):
    """SplitSpec for the on-device HistorySplit executor, or None when
    history splits are off (spec_from_settings + capacity defaults)."""
    from .device_split import spec_from_settings

    if P is None:
        P = params_from_settings(settings)
    if not (P.do_history_split and P.split_radius > 0):
        return None
    caps = dict(split_caps or {})
    # split-lane capacity scales with the configured population: the
    # static default of 8 lanes flagged every frame with more than 8
    # contested merges, which a dense 256-fish arena hits constantly
    # (measured: 58% -> 31% frame flags on the 256-fish synthetic)
    caps.setdefault("max_splits", max(8, P.max_fish // 8))
    return spec_from_settings(settings, **caps)


def track_video_device(frames, background, settings,
                       split_caps: dict = None, **caps) -> dict:
    """Fused device pipeline: batched run-CC detection + scan tracking
    under jit; one host transfer for the whole chunk's history. With
    track_do_history_split on, splits run in-graph (device_split)."""
    from .runcc import detect_batch_runs

    P = params_from_settings(settings)
    kw = _detect_kwargs(settings, caps)
    T = frames.shape[0]
    fr = float(settings["frame_rate"] or 25)
    frames = jnp.asarray(frames)
    background = jnp.asarray(background)
    out = detect_batch_runs(frames, background, **kw)
    det = detections_from_runcc(out, P)
    times = jnp.arange(T) / fr
    hist = track_scan(det, times, jnp.arange(T, dtype=jnp.int32), P,
                      frames=frames, background=background,
                      split_spec=default_split_spec(settings, P,
                                                    split_caps))
    hist["detect_overflow"] = out["overflow"]
    return hist


def track_videos_sharded(frames, background, settings, mesh=None,
                         axis: str = "data", **caps) -> dict:
    """Multi-video device tracking: (V, T, H, W) video batch, one
    independent detect+scan recurrence per video, vmapped and sharded
    over the mesh's `axis` — each chip tracks its own videos end to
    end (the scale-out mapping for BASELINE config 5's batched
    multi-video ingest: tracking is sequential per video, so
    parallelism comes from videos x chips, not frames x chips)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from .runcc import detect_batch_runs

    P = params_from_settings(settings)
    kw = _detect_kwargs(settings, caps)
    V, T = frames.shape[:2]
    fr = float(settings["frame_rate"] or 25)
    times = jnp.broadcast_to(jnp.arange(T) / fr, (V, T))
    fidx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (V, T))

    def one_video(video, t, fi):
        out = detect_batch_runs(video, jnp.asarray(background), **kw)
        det = detections_from_runcc(out, P)
        hist = track_scan(det, t, fi, P)
        hist["detect_overflow"] = out["overflow"]
        return hist

    fn = jax.vmap(one_video)
    frames = jnp.asarray(frames)
    if mesh is not None:
        frames = jax.device_put(frames, NamedSharding(mesh, P_(axis)))
        times = jax.device_put(times, NamedSharding(mesh, P_(axis)))
        fidx = jax.device_put(fidx, NamedSharding(mesh, P_(axis)))
        with mesh:
            return fn(frames, times, fidx)
    return fn(frames, times, fidx)


def _history_from_fast_tracker(tracker, n_frames: int,
                               max_fish: int) -> dict:
    """FastTracker per-frame history -> the track_scan output schema."""
    fx = np.zeros((n_frames, max_fish))
    fy = np.zeros((n_frames, max_fish))
    seen = np.zeros((n_frames, max_fish), bool)
    n_assigned = np.zeros(n_frames, np.int64)
    for f in range(n_frames):
        h = tracker.history.get(f)
        if not h:
            continue
        fid = np.asarray(h["fish"], np.int64)
        ok = fid < max_fish
        fx[f, fid[ok]] = np.asarray(h["x"])[ok]
        fy[f, fid[ok]] = np.asarray(h["y"])[ok]
        seen[f, fid[ok]] = True
        n_assigned[f] = int(
            tracker.statistics[f].number_fish) if f in \
            tracker.statistics else ok.sum()
    # carry last positions forward like the scan does
    for f in range(1, n_frames):
        hold = ~seen[f] & (seen[:f].any(axis=0))
        fx[f, hold] = fx[f - 1, hold]
        fy[f, hold] = fy[f - 1, hold]
    return dict(fish_x=fx, fish_y=fy, fish_seen=seen,
                n_assigned=n_assigned,
                needs_host=np.zeros(n_frames, bool),
                n_fish=np.int32(tracker.n_fish))


def track_video_hybrid(frames, background, settings, **caps) -> dict:
    """Device-first tracking with a host-engine safety net: run the
    fused detect+scan chunk; when any frame flagged needs_host (split
    candidates) or overflowed the detection caps, re-run the chunk
    through the full host FastTracker (history splits, automatic
    matching) and return its history in the same schema. The returned
    dict carries `engine`: "device" or "host"."""
    import jax

    from ..ops.labeling import label_blobs_raw
    from ..track.engine import FastTracker

    hist = jax.device_get(track_video_device(
        np.asarray(frames), background, settings, **caps))
    if not (np.asarray(hist["needs_host"]).any()
            or np.asarray(hist["detect_overflow"]).any()):
        hist["engine"] = "device"
        return hist

    s = settings
    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"])
               if s["track_background_subtraction"] else 0,
               track_absolute=bool(s["track_threshold_is_absolute"]))
    fr = float(s["frame_rate"] or 25)
    tracker = FastTracker(s, np.asarray(background))
    for i, frame in enumerate(np.asarray(frames)):
        tracker.add_frame(i, i / fr, **label_blobs_raw(frame, background,
                                                       **det))
    out = _history_from_fast_tracker(tracker, len(frames),
                                     int(s["track_max_individuals"]))
    out["engine"] = "host"
    out["detect_overflow"] = np.asarray(hist["detect_overflow"])
    return out
