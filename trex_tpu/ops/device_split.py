"""On-device HistorySplit: expectation + threshold-escalation split.

The device counterparts of the host engine's native split pair
(native/labeling.cpp `trex_expectation` / `trex_split_execute`,
themselves the engine's exact re-creation of the reference's
HistorySplit.cpp:170-320 expectation + SplitBlob.cpp:190-245,406-640
threshold escalation). Both run IN-GRAPH inside the tracking scan step
(ops/device_tracker._scan_impl), so frames with merged blobs are split
and re-matched without leaving the chip.

Parity contract: wherever these kernels decide anything, they decide
it exactly like the host — and every decision that could flip under
f32-vs-f64 rounding (a distance within EPS_D of the radius or of a
competing distance, a component size within relative EPS_S of a size
bound, a crop or piece-count capacity overflow) raises the `marginal`
flag instead, which the consumer (track/device_engine.DeviceTracker)
maps to `needs_host` and replays through the host engine. The
differential guarantee of tests/test_device_split.py rests on that
escape hatch: the device path is either bit-faithful or it defers.

Expectation semantics (engine._split_expectation_py, the reference
vectors for native trex_expectation):
- near(f, b): bbox distance hypot <= max_d;
- contested blobs have >= 2 near fish; involved fish touch one;
- sampled mask points per blob (PPFrame::fill_proximity_grid,
  PPFrame.cpp:123-135,891-932): first/last line + even-y lines (all
  lines when < 4); per kept line both endpoints + midpoint + interior
  points every step = floor(max(1, bbox_width*0.1)) px when step >= 5
  and x1-x0 >= 2*step;
- edge(f, b) = near & min sampled-point distance <= max_d;
- per clique (connected fish/blob component) with more fish than
  blobs: deferred-acceptance conflict resolution closest-first; the
  sequential queue of HistorySplit.cpp resolves to the proposer-
  optimal matching, which is processing-order independent for strict
  preferences (Gale-Shapley), so the parallel rounds here terminate in
  the same state — distance ties, where order WOULD matter, raise
  `marginal`;
- every fish that exhausted its edges adds +1 to its original closest
  blob's expectation (+1 extra the first time if that blob ended the
  greedy owned).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
# px guard on distance comparisons: covers the f32-vs-host-f64 gap.
# Worst-case f32 error chain (centroid sums ~1e5 -> position error
# <= ~1e-4 px at 4k coordinates -> distance error ~2e-4) leaves 5x
# headroom; looser values flood crowded frames with false deferrals
# (26/32 frames at 1e-2 on the 64-fish bench scene).
EPS_D = 1e-3
EPS_S = 1e-5     # relative: dynamic-bound size comparisons


def _run_sample_min_d2(fish_x, fish_y, runs_y, runs_x0, runs_x1,
                       runs_slot, step_b, count_b, B: int):
    """Min squared distance from each fish to each blob's SAMPLED mask
    points (see module docstring for the sampling rule).

    fish_x/fish_y: (F,) f32. runs_*: (R,) int32, slot == B for padding.
    step_b: (B,) int32 interior step per blob; count_b: (B,) int32 run
    count per blob. Returns md2 (F, B) f32.
    """
    R = runs_y.shape[0]
    valid = runs_slot < B
    slot = jnp.minimum(runs_slot, B)
    order = jnp.arange(R, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    first = jax.ops.segment_min(jnp.where(valid, order, big), slot,
                                num_segments=B + 1)
    last = jax.ops.segment_max(jnp.where(valid, order, -1), slot,
                               num_segments=B + 1)
    cnt_of = count_b[jnp.minimum(slot, B - 1)]
    keep = valid & ((runs_y % 2 == 0) | (cnt_of < 4)
                    | (order == first[slot]) | (order == last[slot]))

    st = step_b[jnp.minimum(slot, B - 1)]
    wide = keep & (st >= 5) & (runs_x1 - runs_x0 >= 2 * st)
    st_safe = jnp.maximum(st, 1)
    n_int = jnp.where(wide,
                      (runs_x1 - runs_x0 - 2 * st_safe) // st_safe + 1,
                      0)

    x0 = runs_x0.astype(jnp.float32)
    x1 = runs_x1.astype(jnp.float32)
    y = runs_y.astype(jnp.float32)
    xm = x0 + (x1 - x0) * 0.5
    stf = st_safe.astype(jnp.float32)

    def per_fish(fx, fy):
        dy2 = (y - fy) ** 2                      # (R,)
        best = jnp.minimum((x0 - fx) ** 2, (x1 - fx) ** 2)
        best = jnp.minimum(best, (xm - fx) ** 2)
        # nearest interior sample analytically (+/-1 for round safety)
        k = jnp.round((fx - x0 - stf) / stf)
        for dk in (-1.0, 0.0, 1.0):
            kk = jnp.clip(k + dk, 0.0, (n_int - 1).astype(jnp.float32))
            xi = x0 + stf * (1.0 + kk)
            cand = jnp.where(n_int > 0, (xi - fx) ** 2, INF)
            best = jnp.minimum(best, cand)
        d2 = jnp.where(keep, best + dy2, INF)
        return jax.ops.segment_min(d2, slot, num_segments=B + 1)[:B]

    md2 = jax.vmap(per_fish)(fish_x, fish_y)     # (F, B)
    return md2


def _clique_labels(edge, F: int, B: int):
    """Min-label propagation over the fish/blob bipartite edge graph.
    Returns (labf (F,), labb (B,)) int32; nodes without edges keep a
    unique label (their own index), so they form singleton cliques."""
    labf0 = jnp.arange(F, dtype=jnp.int32)
    labb0 = jnp.arange(F, F + B, dtype=jnp.int32)

    def body(state):
        labf, labb, _ = state
        bmin = jnp.min(jnp.where(edge, labb[None, :], 1 << 30), axis=1)
        labf2 = jnp.minimum(labf, bmin.astype(jnp.int32))
        fmin = jnp.min(jnp.where(edge, labf2[:, None], 1 << 30), axis=0)
        labb2 = jnp.minimum(labb, fmin.astype(jnp.int32))
        changed = jnp.any(labf2 != labf) | jnp.any(labb2 != labb)
        return labf2, labb2, changed

    labf, labb, _ = jax.lax.while_loop(
        lambda s: s[2], body, (labf0, labb0, jnp.bool_(True)))
    return labf, labb


def _gale_shapley(DM, resolving_f, F: int, B: int):
    """Parallel deferred acceptance over the (F, B) preference matrix
    DM (f32 distances, INF = no edge). Only `resolving_f` fish
    participate. Returns (owner (B,) int32 -1=free, exhausted (F,)
    bool)."""
    DM = jnp.where(resolving_f[:, None], DM, INF)
    has_edge = jnp.any(DM < INF, axis=1)

    def body(state):
        popped, owner, owner_d, matched, _ = state
        rem = jnp.where(popped, INF, DM)
        best_d = jnp.min(rem, axis=1)
        prop_b = jnp.argmin(rem, axis=1).astype(jnp.int32)  # ties: low b
        proposing = ~matched & (best_d < INF)
        # per blob: the best proposer this round (ties flagged upstream)
        pd = jnp.where(proposing, best_d, INF)
        prop_of_b = jnp.full((B,), INF).at[
            jnp.where(proposing, prop_b, B - 1)].min(pd)
        # winner fish per blob: argmin over fish proposing to it
        key = jnp.where(proposing[:, None]
                        & (prop_b[:, None] == jnp.arange(B)[None, :]),
                        best_d[:, None], INF)
        win_f = jnp.argmin(key, axis=0).astype(jnp.int32)
        has_prop = prop_of_b < INF
        beats = has_prop & (prop_of_b < owner_d)
        # displaced incumbents: unmatched + pop that edge (their next
        # sequential proposal would be rejected: owner_d only decreases)
        old_owner = owner
        displaced = beats & (old_owner >= 0)
        popped = popped.at[jnp.clip(old_owner, 0, F - 1),
                           jnp.arange(B)].max(displaced)
        owner = jnp.where(beats, win_f, owner)
        owner_d = jnp.where(beats, prop_of_b, owner_d)
        # matched update
        matched = matched & ~jnp.any(
            (old_owner[None, :] == jnp.arange(F)[:, None])
            & displaced[None, :], axis=1)
        matched = matched | jnp.any(
            (owner[None, :] == jnp.arange(F)[:, None]) & beats[None, :],
            axis=1)
        # rejected proposers pop their proposal
        won = jnp.any((owner[None, :] == jnp.arange(F)[:, None])
                      & (prop_b[:, None] == jnp.arange(B)[None, :])
                      & beats[None, :], axis=1)
        reject = proposing & ~won
        popped = popped.at[jnp.arange(F),
                           jnp.minimum(prop_b, B - 1)].max(reject)
        return popped, owner, owner_d, matched, jnp.any(proposing)

    state0 = (jnp.zeros((F, B), bool),
              jnp.full((B,), -1, jnp.int32),
              jnp.full((B,), INF),
              jnp.zeros((F,), bool),
              jnp.bool_(True))
    popped, owner, owner_d, matched, _ = jax.lax.while_loop(
        lambda s: s[4], body, state0)
    exhausted = has_edge & ~matched \
        & jnp.all(popped | (DM >= INF), axis=1)
    return owner, exhausted


def expectation_counts(fish_x, fish_y, fish_valid,
                       runs_y, runs_x0, runs_x1, runs_slot,
                       bx0, by0, bx1, by1, bvalid,
                       max_d: jax.Array, B: int):
    """In-graph HistorySplit expectation over one frame's blob table.

    fish_*: (F,) f32 positions + validity (the host's pos_ok set).
    runs_*: (R,) int32 track-mask run tables (slot == B padding).
    b*: (B,) f32 blob bounding boxes (x0, y0, x1, y1), bvalid bool.
    Returns (expect (B,) int32, marginal bool): expect >= 2 marks a
    blob the host would split into that many pieces; `marginal` means
    a decision was within EPS of flipping — defer to the host.
    """
    F = fish_x.shape[0]
    fx = fish_x[:, None]
    fy = fish_y[:, None]
    dx = jnp.maximum(0.0, jnp.maximum(bx0[None, :] - fx,
                                      fx - bx1[None, :]))
    dy = jnp.maximum(0.0, jnp.maximum(by0[None, :] - fy,
                                      fy - by1[None, :]))
    bbd = jnp.hypot(dx, dy)
    ok = fish_valid[:, None] & bvalid[None, :]
    near = ok & (bbd <= max_d)
    marginal = jnp.any(ok & (jnp.abs(bbd - max_d) <= EPS_D))

    contested = jnp.sum(near, axis=0) >= 2
    involved = jnp.any(near & contested[None, :], axis=1)
    any_contested = jnp.any(contested)

    # sampled-point distances (only meaningful rows are consumed);
    # the interior-sample step floor(max(1, width*0.1)) equals
    # max(1, width // 10) for every integer width (verified for all
    # w <= 2e5), so it is computed EXACTLY — no epsilon guard
    width_i = (bx1 - bx0).astype(jnp.int32) + 1
    step_b = jnp.maximum(1, width_i // 10)
    valid_run = runs_slot < B
    count_b = jax.ops.segment_sum(
        valid_run.astype(jnp.int32), jnp.minimum(runs_slot, B),
        num_segments=B + 1)[:B]
    md2 = _run_sample_min_d2(fish_x, fish_y, runs_y, runs_x0,
                             runs_x1, runs_slot, step_b, count_b, B)
    md = jnp.sqrt(md2)
    edge = near & involved[:, None] & (md <= max_d)
    marginal = marginal | jnp.any(
        near & involved[:, None] & (jnp.abs(md - max_d) <= EPS_D))

    labf, labb = _clique_labels(edge, F, B)
    # per clique: fish count vs blob count (only nodes with edges)
    f_in = jnp.any(edge, axis=1)
    b_in = jnp.any(edge, axis=0)
    same_fb = labf[:, None] == labb[None, :]
    # nf per blob-clique / nb per fish-clique via pairwise label match
    nf_of_f = jnp.sum((labf[:, None] == labf[None, :])
                      & f_in[None, :], axis=1)
    nb_of_f = jnp.sum(same_fb & b_in[None, :], axis=1)
    resolving_f = f_in & (nf_of_f > nb_of_f)

    # distance ties anywhere within a resolving clique make the
    # sequential queue order observable: defer to the host
    labf_b = jnp.broadcast_to(labf[:, None], edge.shape)
    rez_edge = edge & resolving_f[:, None]
    keys = jnp.where(rez_edge, labf_b, 1 << 30).reshape(-1)
    dist = jnp.where(rez_edge, md, INF).reshape(-1)
    sk, sd = jax.lax.sort((keys, dist), num_keys=2)
    tie = (sk[1:] == sk[:-1]) & (sk[1:] < (1 << 30)) \
        & (jnp.abs(sd[1:] - sd[:-1]) <= EPS_D)
    marginal = marginal | jnp.any(tie)

    DM = jnp.where(edge, md, INF)
    owner, exhausted = _gale_shapley(DM, resolving_f, F, B)
    orig_best = jnp.argmin(DM, axis=1).astype(jnp.int32)  # ties: low b
    cnt = jax.ops.segment_sum(
        exhausted.astype(jnp.int32),
        jnp.where(exhausted, orig_best, B), num_segments=B + 1)[:B]
    expect = cnt + ((cnt > 0) & (owner >= 0)).astype(jnp.int32)
    expect = jnp.where(any_contested, expect, 0)
    # Skip deferral only when even the EPS-widened near sets leave
    # every blob uncontested: host-near (f64) is a subset of eps-near,
    # so an uncontested-eps frame cannot split on the host either.
    # Masking with the STRICT contested test would erase the boundary
    # flag exactly when the boundary decision determines contestedness
    # (f32 rounds a bbox distance just above max_d -> near count 1).
    near_eps = ok & (bbd <= max_d + EPS_D)
    contested_eps = jnp.any(jnp.sum(near_eps, axis=0) >= 2)
    marginal = marginal & contested_eps
    return expect, marginal


# ---------------------------------------------------------------------------
# Split execution (native trex_split_execute, SplitBlob.cpp semantics)
# ---------------------------------------------------------------------------

class SplitSpec(NamedTuple):
    """Static configuration for the on-device split executor (the
    arguments engine._split_native feeds trex_split_execute, plus the
    fixed-capacity crop caps)."""
    initial: int            # _initial_threshold(settings)
    absolute: bool          # track_threshold_is_absolute
    cm_sqr: float
    max_shrink: float       # blob_split_max_shrink
    shrink_limit: float     # blob_split_global_shrink_limit
    ranges: tuple           # track_size_filter ((lo, hi), ...)
    enabled: bool = True    # blob_split_algorithm != "none"
    crop_h: int = 64
    crop_w: int = 64
    max_runs: int = 256     # runs per crop at one threshold
    max_pieces: int = 8     # kept child rows per split blob
    max_splits: int = 8     # split blobs handled per frame


def spec_from_settings(s, **caps) -> SplitSpec:
    from ..track.splitting import _initial_threshold

    cm = float(s["cm_per_pixel"] or 1.0)
    ranges = tuple(tuple(float(v) for v in r)
                   for r in (s["track_size_filter"] or []))
    return SplitSpec(
        initial=_initial_threshold(s),
        absolute=bool(s["track_threshold_is_absolute"]),
        cm_sqr=cm * cm,
        max_shrink=float(s["blob_split_max_shrink"]),
        shrink_limit=float(s["blob_split_global_shrink_limit"]),
        ranges=ranges,
        enabled=s["blob_split_algorithm"] != "none",
        **caps)


def _cc_run_labels(ry, rx0, rx1, valid, R: int):
    """Component labels (min run index) over run tables via pairwise
    8-connectivity adjacency + min propagation with path halving.
    Returns (R,) int32 labels, R for invalid runs."""
    adj = (valid[:, None] & valid[None, :]
           & (jnp.abs(ry[:, None] - ry[None, :]) == 1)
           & (rx0[:, None] <= rx1[None, :] + 1)
           & (rx0[None, :] <= rx1[:, None] + 1))
    init = jnp.where(valid, jnp.arange(R, dtype=jnp.int32), R)
    initp = jnp.concatenate([init, jnp.full((1,), R, jnp.int32)])

    def body(state):
        L, _ = state                     # (R + 1,), L[R] == R
        neigh = jnp.min(jnp.where(adj, L[None, :R], R), axis=1)
        new = jnp.minimum(L[:R], neigh.astype(jnp.int32))
        newp = jnp.concatenate([new, jnp.full((1,), R, jnp.int32)])
        newp = newp[newp]
        newp = newp[newp]
        return newp, jnp.any(newp != L)

    L, _ = jax.lax.while_loop(lambda s: s[1], body,
                              (initp, jnp.bool_(True)))
    return L[:R]


def _crop_window(frame, background, bi, bx0i, by0i,
                 runs_y, runs_x0, runs_x1, runs_slot,
                 crop_h: int, crop_w: int):
    """Shared crop-window builder: fetch the (crop_h, crop_w) image +
    background windows at origin bbox - 1 (to_dense(pad=1)) and paint
    blob `bi`'s runs into an in_run mask (start/stop scatter +
    cumsum). Callers apply their own diff semantics on top (the split
    executor masks the IMAGE, the posture chain masks the DIFF)."""
    H, W = frame.shape
    CH, CW = crop_h, crop_w
    ox = bx0i - 1
    oy = by0i - 1
    gy = oy + jnp.arange(CH, dtype=jnp.int32)[:, None]
    gx = ox + jnp.arange(CW, dtype=jnp.int32)[None, :]
    inb = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    gyc = jnp.clip(gy, 0, H - 1)
    gxc = jnp.clip(gx, 0, W - 1)
    img = jnp.where(inb, frame[gyc, gxc], 0).astype(jnp.int32)
    bgc = jnp.where(inb, background[gyc, gxc], 0).astype(jnp.int32)

    mine = runs_slot == bi
    row = jnp.where(mine, runs_y - oy, CH)
    row = jnp.clip(row, 0, CH)            # foreign/padded runs -> dump
    c0 = jnp.clip(jnp.where(mine, runs_x0 - ox, CW), 0, CW)
    c1 = jnp.clip(jnp.where(mine, runs_x1 - ox + 1, CW), 0, CW)
    acc = jnp.zeros((CH + 1, CW + 1), jnp.int32)
    acc = acc.at[row, c0].add(1).at[row, c1].add(-1)
    in_run = jnp.cumsum(acc[:CH, :CW], axis=1) > 0
    return img, bgc, in_run, mine, ox, oy


def _crop_diff(frame, background, bi, bx0i, by0i,
               runs_y, runs_x0, runs_x1, runs_slot, spec: SplitSpec):
    """Masked diff crop for the escalation scan (native
    trex_split_execute's img/bgcrop/diff build, in global frame
    coordinates; origin = bbox - 1 like to_dense(pad=1))."""
    img, bgc, in_run, _, ox, oy = _crop_window(
        frame, background, bi, bx0i, by0i,
        runs_y, runs_x0, runs_x1, runs_slot, spec.crop_h, spec.crop_w)
    imgm = jnp.where(in_run, img, bgc)
    if spec.absolute:
        diff = jnp.where(imgm != 0, jnp.abs(imgm - bgc), 0)
    else:
        d = bgc - imgm
        diff = jnp.where((imgm != 0) & (d > 0), d, 0)
    return diff, ox, oy


def _int_ge(bound: float, cm_sqr: float) -> int:
    """Smallest integer n with n * cm_sqr >= bound under f64 (= the
    host's double) arithmetic. Lets the device compare integer pixel
    counts EXACTLY instead of reproducing f64 products in f32."""
    import math
    if bound <= 0:
        return 0
    if math.isinf(bound):
        return 1 << 60
    n = max(0, int(math.floor(bound / cm_sqr)) - 2)
    while n * cm_sqr < bound:
        n += 1
    return n


def _int_le(bound: float, cm_sqr: float) -> int:
    """Largest integer n with n * cm_sqr <= bound under f64; -1 when
    none."""
    import math
    if bound < 0:
        return -1
    if math.isinf(bound):
        return 1 << 60
    n = max(0, int(math.floor(bound / cm_sqr)) + 2)
    while n > 0 and n * cm_sqr > bound:
        n -= 1
    if n == 0 and 0 * cm_sqr > bound:
        return -1
    return n


def _size_bounds(spec: SplitSpec):
    """Static integer decision boundaries for the escalation scan:
    (range (n_lo, n_hi) pairs, n_min_thresh or None, n_max_hi).
    n_min_thresh is None when no ranges exist (dynamic threshold)."""
    if not spec.ranges:
        return (), None, 1 << 60
    bounds = tuple((_int_ge(lo, spec.cm_sqr), _int_le(hi, spec.cm_sqr))
                   for lo, hi in spec.ranges)
    max_lo, max_hi = spec.ranges[0]
    for lo, hi in spec.ranges:
        if hi > max_hi:
            max_lo, max_hi = lo, hi
    n_min = _int_ge(max_lo * spec.shrink_limit, spec.cm_sqr)
    n_hi = _int_le(max_hi, spec.cm_sqr)
    return bounds, n_min, n_hi


def _in_any_range(n, spec: SplitSpec):
    """Range membership of integer piece sizes (exact)."""
    if not spec.ranges:
        return jnp.ones(n.shape, bool)
    bounds, _, _ = _size_bounds(spec)
    in_any = jnp.zeros(n.shape, bool)
    for n_lo, n_hi in bounds:
        in_any = in_any | ((n >= n_lo) & (n <= n_hi))
    return in_any


def split_execute_device(frame, background, bi, bx0i, by0i,
                         runs_y, runs_x0, runs_x1, runs_slot,
                         expected, spec: SplitSpec):
    """One-shot split of blob `bi` (native trex_split_execute): build
    the masked diff crop, escalate the threshold until the evaluation
    keeps (trex_split_scan), materialize the winning components.

    Returns (rows (max_pieces, 7) f32 [n, x0, y0, x1, y1, sum_x,
    sum_y] in frame coordinates and size-desc order, n_out i32,
    marginal bool). marginal = any size/threshold decision within EPS
    of flipping, crop/run/piece capacity overflow — defer to host.
    """
    R = spec.max_runs
    CH, CW = spec.crop_h, spec.crop_w
    diff, ox, oy = _crop_diff(frame, background, bi, bx0i, by0i,
                              runs_y, runs_x0, runs_x1, runs_slot, spec)
    rel = lambda a, b: jnp.abs(a - b) <= EPS_S * jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.abs(b)), 1.0)

    def eval_thr(thr):
        """One threshold's CC + SplitBlob::evaluate_result_multiple.
        Returns decision scalars + the run tables for materialization."""
        from .runcc import _run_tables

        mask = diff >= thr
        rt = _run_tables(mask, R)
        valid = rt["y"] >= 0
        ry, rx0, rx1 = rt["y"], rt["x0"], rt["x1"]
        labels = _cc_run_labels(ry, rx0, rx1, valid, R)
        length = jnp.where(valid, rx1 - rx0 + 1, 0)
        sizes = jax.ops.segment_sum(
            length, jnp.where(valid, labels, R), num_segments=R + 1)[:R]
        sizes_desc = -jnp.sort(-sizes)
        total = jnp.sum(length)
        marg = rt["overflow"]
        return (mask, ry, rx0, rx1, valid, labels, sizes,
                sizes_desc, total, marg)

    _, n_min_static, n_hi_static = _size_bounds(spec)

    def decide(sizes_desc, total, n_first, expected):
        """keep/abort decisions at one threshold (shared between the
        scan loop and the re-evaluation on materialized pieces).
        Range/shrink comparisons run on integer pixel counts against
        static f64-derived boundaries — exact, no epsilon; only the
        dynamic-bound comparisons (abort, no-ranges min-threshold)
        carry a marginality guard."""
        total_cm = total.astype(jnp.float32) * spec.cm_sqr
        fs = n_first.astype(jnp.float32) * spec.cm_sqr
        abort = total_cm < spec.max_shrink * fs
        marg = rel(total_cm, spec.max_shrink * fs) & (n_first > 0)
        nonzero = sizes_desc > 0
        if spec.ranges:
            kept = jnp.sum(nonzero & (sizes_desc >= n_min_static))
        else:
            scm = sizes_desc.astype(jnp.float32) * spec.cm_sqr
            thrf = total_cm * spec.max_shrink
            kept = jnp.sum(nonzero & (scm >= thrf))
            marg = marg | jnp.any(nonzero & rel(scm, thrf))
        take = jnp.minimum(kept, expected)
        top = jnp.arange(R) < take
        valid_cnt = jnp.sum(top & _in_any_range(sizes_desc, spec))
        min_n = jnp.where(take > 0,
                          sizes_desc[jnp.maximum(take - 1, 0)], 0)
        if spec.ranges:
            remove = (take > 0) & (min_n > n_hi_static)
        else:
            remove = jnp.bool_(False)
        keep = ~remove & (valid_cnt >= expected)
        return keep, abort, kept, marg

    def scan_body(carry):
        (thr, best, n_first, marg, done,
         ry, rx0, rx1, valid, labels, sizes) = carry
        (_, nry, nrx0, nrx1, nvalid, nlabels, nsizes,
         sizes_desc, total, m1) = eval_thr(thr)
        n_first = jnp.where(thr == spec.initial, sizes_desc[0], n_first)
        keep, abort, _, m2 = decide(sizes_desc, total, n_first,
                                    expected)
        # threshold jump: the mask (diff >= t) is constant for t in
        # [thr, min present value], so the native scan's per-1
        # escalation (trex_split_scan) decides identically there —
        # evaluate only at thresholds where the mask changes
        min_in = jnp.min(jnp.where(diff >= thr, diff, 256))
        nxt = (min_in + 1).astype(jnp.int32)
        done = keep | abort | (nxt > 255) | (total == 0)
        best = jnp.where(keep, thr, -1)
        return (nxt, best, n_first, marg | m1 | m2, done,
                nry, nrx0, nrx1, nvalid, nlabels, nsizes)

    z = jnp.zeros((R,), jnp.int32)
    carry0 = (jnp.int32(max(1, spec.initial)), jnp.int32(-1),
              jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
              z, z, z, jnp.zeros((R,), bool), z, z)
    (_, best_thr, n_first, marginal, _, ry, rx0, rx1, valid,
     labels, sizes) = jax.lax.while_loop(
        lambda c: ~c[4], scan_body, carry0)

    # materialize pieces at best_thr from the final iteration's tables
    # (piece order = size desc, stable on first-run index, exactly the
    # native stable_sort over creation order)
    ilen = jnp.where(valid, rx1 - rx0 + 1, 0)
    length = ilen.astype(jnp.float32)
    seg = jnp.where(valid, labels, R)
    n_root = jax.ops.segment_sum(ilen, seg, num_segments=R + 1)[:R]
    sx_root = jax.ops.segment_sum(
        (rx0 + rx1).astype(jnp.float32) * 0.5 * length, seg,
        num_segments=R + 1)[:R]
    sy_root = jax.ops.segment_sum(
        ry.astype(jnp.float32) * length, seg, num_segments=R + 1)[:R]
    big = jnp.int32(1 << 30)
    x0_root = jax.ops.segment_min(jnp.where(valid, rx0, big), seg,
                                  num_segments=R + 1)[:R]
    y0_root = jax.ops.segment_min(jnp.where(valid, ry, big), seg,
                                  num_segments=R + 1)[:R]
    x1_root = jax.ops.segment_max(jnp.where(valid, rx1, -1), seg,
                                  num_segments=R + 1)[:R]
    y1_root = jax.ops.segment_max(jnp.where(valid, ry, -1), seg,
                                  num_segments=R + 1)[:R]
    is_root = n_root > 0
    order = jnp.lexsort((jnp.arange(R),
                         jnp.where(is_root, -n_root, 1)))
    n_o = n_root[order]
    # re-evaluation (evaluate_result_multiple on materialized pieces);
    # identical arrays to the winning scan iteration, so the decision
    # cannot flip — recomputed for the kept-prefix piece filter
    keep2, abort2, kept, _ = decide(n_o, jnp.sum(n_o), n_first,
                                    expected)
    ok = (best_thr >= 0) & keep2 & ~abort2
    n_out = jnp.where(ok, jnp.minimum(kept, spec.max_pieces), 0)
    marginal = marginal | (ok & (kept > spec.max_pieces))

    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    P = spec.max_pieces
    sel = order[:P]
    n_of = n_o[:P].astype(jnp.float32)
    rows = jnp.stack([
        n_of,
        x0_root[sel].astype(jnp.float32) + oxf,
        y0_root[sel].astype(jnp.float32) + oyf,
        x1_root[sel].astype(jnp.float32) + oxf,
        y1_root[sel].astype(jnp.float32) + oyf,
        sx_root[sel] + n_of * oxf,
        sy_root[sel] + n_of * oyf,
    ], axis=1)
    live = jnp.arange(P) < n_out
    rows = jnp.where(live[:, None], rows, 0.0)
    return rows, n_out.astype(jnp.int32), marginal
