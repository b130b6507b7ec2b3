"""On-device posture: outline trace -> midline, vmappable per blob.

Ports the host posture chain (track/posture.py, itself re-creating the
reference's tracking/Posture.cpp:305-410 + tracking/Outline.cpp) to
fixed-shape JAX so the fused device tracking path can run the
reference's e2e configuration (calculate_posture=true) without leaving
the chip:

1. masked diff crop + posture threshold (threshold_get_biggest_blob)
2. biggest 8-connected component (run tables + min-label CC, reused
   from ops/device_split)
3. Moore boundary trace on the 4x-supersampled mask (the host traces
   kron(mask, 4x4) and divides by 4 — the supersampled occupancy is
   read directly from the 1x mask here, same trace, no materialized
   4x image)
4. Outline::resample — emission indices are closed-form per segment
   (walked distance mod spacing), so the host's sequential walk
   becomes a gather
5. triangular smoothing, clockwise orientation, optional elliptic-
   Fourier approximation (Outline.cpp:380-513)
6. Menger curvature over the ratio window, tail = strongest peak,
   head = circularly farthest peak (Outline.cpp:515-700)
7. midline pairing walk from the tail (Outline.cpp:768-866) as a
   `lax.while_loop` (each step advances the left/right pointers by
   windowed argmin, <= L/2 iterations)
8. Midline::post_process (movement-direction inversion + stiff-part
   straightening) and Midline::normalize's arc-length resample to
   `midline_resolution` points; midline length = chord sum
   (Outline.cpp:890-1010, 1270-1408)
9. threshold escalation (+2 up to +100) while the midline fails
   (Posture.cpp:305-410)

All buffers are fixed-capacity (PostureSpec caps); a lane that
overflows any cap sets `overflow` so the caller can recompute that
blob on the host (the usual defer-marginal pattern). Numerically the
chain runs in f32 like the native batch kernel
(native/posture_chain.cpp); parity with the host chain is asserted to
float tolerance by tests/test_device_posture.py (midline length agrees
to ~1e-2 px), not bit-exactness — posture results never feed back into
the tracking recurrence, so tolerance cannot corrupt assignments.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .device_split import _cc_run_labels

_NEG = jnp.float32(-1e9)
_INF = jnp.float32(jnp.inf)

# Moore neighbourhood, clockwise, as used by the host trace
# (track/posture._trace_boundary_py `order`): (dy, dx)
_ORDER_Y = np.array([0, -1, -1, -1, 0, 1, 1, 1], np.int32)
_ORDER_X = np.array([-1, -1, 0, 1, 1, 1, 0, -1], np.int32)


class PostureSpec(NamedTuple):
    """Static posture configuration + device capacities."""
    threshold: int              # track_posture_threshold
    absolute: bool              # track_threshold_is_absolute
    resample_d: float           # outline_resample
    smooth_samples: int         # outline_smooth_samples
    smooth_step: int            # outline_smooth_step (>= 1)
    approximate: int            # outline_approximate (EFT harmonics)
    curvature_ratio: float      # outline_curvature_range_ratio
    walk_offset: float          # midline_walk_offset
    stiff_pct: float            # midline_stiff_percentage
    midline_res: int            # midline_resolution
    invert: bool                # midline_invert
    start_with_head: bool       # midline_start_with_head
    crop_h: int = 64
    crop_w: int = 64
    max_runs: int = 256         # run-table capacity per crop
    max_trace: int = 2048       # supersampled boundary point cap
    max_outline: int = 512      # resampled outline cap
    enabled: bool = True


def spec_from_settings(s, **caps) -> PostureSpec:
    if int(s["posture_closing_steps"]) != 0:
        # morphological closing stays on the host chain (same
        # restriction as the native batch kernel)
        caps.setdefault("enabled", False)
    return PostureSpec(
        threshold=int(s["track_posture_threshold"]),
        absolute=bool(s["track_threshold_is_absolute"]),
        resample_d=float(s["outline_resample"]),
        smooth_samples=int(s["outline_smooth_samples"]),
        smooth_step=max(1, int(s["outline_smooth_step"])),
        approximate=int(s["outline_approximate"]),
        curvature_ratio=float(s["outline_curvature_range_ratio"]),
        walk_offset=float(s["midline_walk_offset"]),
        stiff_pct=float(s["midline_stiff_percentage"]),
        midline_res=int(s["midline_resolution"]),
        invert=bool(s["midline_invert"]),
        start_with_head=bool(s["midline_start_with_head"]),
        **caps)


# ---------------------------------------------------------------------------
# crop + biggest component
# ---------------------------------------------------------------------------

def _crop_blob(frame, background, bi, bx0i, by0i,
               runs_y, runs_x0, runs_x1, runs_slot,
               spec: PostureSpec):
    """Blob-masked diff crop, origin = bbox - 1 (to_dense(pad=1)).
    Returns (diff (CH, CW) i32, in_run bool, npix i32). Window fetch +
    run painting shared with the split executor (_crop_window); only
    the diff semantics differ (the posture chain masks the DIFF, the
    executor masks the IMAGE)."""
    from .device_split import _crop_window

    img, bgc, in_run, mine, _, _ = _crop_window(
        frame, background, bi, bx0i, by0i,
        runs_y, runs_x0, runs_x1, runs_slot, spec.crop_h, spec.crop_w)
    npix = jnp.sum(jnp.where(mine, runs_x1 - runs_x0 + 1, 0))

    if spec.absolute:
        diff = jnp.where(in_run, jnp.abs(img - bgc), 0)
    else:
        diff = jnp.where(in_run, jnp.maximum(bgc - img, 0), 0)
    return diff, in_run, npix


def _mask_run_tables(mask, R: int):
    """Horizontal run tables of a dense (CH, CW) bool mask:
    (y, x0, x1) each (R,) with y == -1 padding, plus overflow."""
    CH, CW = mask.shape
    m = mask
    left = jnp.concatenate([jnp.zeros((CH, 1), bool), m[:, :-1]], 1)
    right = jnp.concatenate([m[:, 1:], jnp.zeros((CH, 1), bool)], 1)
    starts = m & ~left
    ends = m & ~right
    ys, xs = jnp.nonzero(starts, size=R, fill_value=-1)
    ye, xe = jnp.nonzero(ends, size=R, fill_value=-1)
    n_runs = jnp.sum(starts)
    overflow = n_runs > R
    return (ys.astype(jnp.int32), xs.astype(jnp.int32),
            xe.astype(jnp.int32), ye, overflow)


def _biggest_component(mask, spec: PostureSpec):
    """Largest 8-connected component of a crop mask (run-table CC).
    Returns (dense bool (CH, CW), comp_pixels i32, overflow)."""
    R = spec.max_runs
    CH, CW = mask.shape
    ry, rx0, rx1, _, overflow = _mask_run_tables(mask, R)
    valid = ry >= 0
    labels = _cc_run_labels(ry, rx0, rx1, valid, R)
    length = jnp.where(valid, rx1 - rx0 + 1, 0)
    sizes = jax.ops.segment_sum(length, jnp.where(valid, labels, R),
                                num_segments=R + 1)[:R]
    big = jnp.argmax(sizes).astype(jnp.int32)
    npx = sizes[big]
    keep = valid & (labels == big)
    row = jnp.clip(jnp.where(keep, ry, CH), 0, CH)
    c0 = jnp.clip(jnp.where(keep, rx0, CW), 0, CW)
    c1 = jnp.clip(jnp.where(keep, rx1 + 1, CW), 0, CW)
    acc = jnp.zeros((CH + 1, CW + 1), jnp.int32)
    acc = acc.at[row, c0].add(1).at[row, c1].add(-1)
    dense = jnp.cumsum(acc[:CH, :CW], axis=1) > 0
    return dense, npx, overflow


# ---------------------------------------------------------------------------
# supersampled Moore trace
# ---------------------------------------------------------------------------

def _trace4(dense, spec: PostureSpec):
    """Moore boundary trace of kron(dense, 4x4)/4 without building the
    4x image (occupancy at (Y, X) is dense[Y//4, X//4]). Exactly the
    host's _trace_boundary_py sequence: start at the topmost-leftmost
    pixel, clockwise, stop on closure, drop the duplicated start.

    Returns (pts (max_trace, 2) f32 [x, y] in 1x crop coordinates,
    n i32, overflow bool)."""
    CH, CW = dense.shape
    S = spec.max_trace
    oy = jnp.asarray(_ORDER_Y)
    ox = jnp.asarray(_ORDER_X)

    any_row = jnp.any(dense, axis=1)
    y0 = jnp.argmax(any_row).astype(jnp.int32)
    x0 = jnp.argmax(dense[y0]).astype(jnp.int32)
    sy, sx = y0 * 4, x0 * 4            # 4x coordinates
    empty = ~jnp.any(dense)

    def occ(y, x):
        inb = (y >= 0) & (y < CH * 4) & (x >= 0) & (x < CW * 4)
        yc = jnp.clip(y // 4, 0, CH - 1)
        xc = jnp.clip(x // 4, 0, CW - 1)
        return inb & dense[yc, xc]

    buf = jnp.zeros((S, 2), jnp.int32).at[0].set(
        jnp.stack([sy, sx]))

    def cond(st):
        _, _, _, n, _, done = st
        return ~done & (n < S)

    def body(st):
        cy, cx, back, n, buf, done = st
        d = (back + 1 + jnp.arange(8, dtype=jnp.int32)) % 8
        ny = cy + oy[d]
        nx = cx + ox[d]
        hit = jax.vmap(occ)(ny, nx)
        k = jnp.argmax(hit).astype(jnp.int32)
        found = jnp.any(hit)
        dd = d[k]
        cy2 = jnp.where(found, ny[k], cy)
        cx2 = jnp.where(found, nx[k], cx)
        buf = buf.at[n].set(jnp.stack([cy2, cx2]))
        n2 = jnp.where(found, n + 1, n)
        closed = found & (cy2 == sy) & (cx2 == sx) & (n2 > 2)
        back2 = jnp.where(found, (dd + 4) % 8, back)
        return cy2, cx2, back2, n2, buf, (~found) | closed

    cy, cx, back, n, buf, done = jax.lax.while_loop(
        cond, body, (sy, sx, jnp.asarray(0, jnp.int32),
                     jnp.asarray(1, jnp.int32), buf, empty))
    overflow = (~done) & (n >= S)
    # closure appended the start again: drop it (host boundary[:-1])
    closed = done & (cy == sy) & (cx == sx) & (n > 2)
    n = jnp.where(closed, n - 1, n)
    pts = jnp.stack([buf[:, 1].astype(jnp.float32) / 4.0,   # x
                     buf[:, 0].astype(jnp.float32) / 4.0],  # y
                    axis=1)
    n = jnp.where(empty, 0, n)
    return pts, n, overflow


# ---------------------------------------------------------------------------
# Outline::resample — closed-form emission indices
# ---------------------------------------------------------------------------

def _resample(pts, n, spec: PostureSpec):
    """Outline::resample semantics (track/posture._resample_py): walk
    the closed polygon; whenever the walked distance crosses the
    spacing, emit points p0 + dir * (o * d / seg) for o = 0..k-1.
    k per segment and the emission offsets are closed-form in the
    prefix arc length, so the walk vectorizes to a gather.

    Returns (out (max_outline, 2) f32, m i32, overflow bool)."""
    S = pts.shape[0]
    M = spec.max_outline
    d = jnp.float32(spec.resample_d)
    idx = jnp.arange(S)
    valid = idx < n
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    p0 = pts
    p1 = pts[nxt]
    seg = jnp.where(valid,
                    jnp.hypot(p1[:, 0] - p0[:, 0], p1[:, 1] - p0[:, 1]),
                    0.0)
    cum = jnp.cumsum(seg)
    cum_prev = cum - seg
    wb = jnp.mod(cum_prev, d)
    k = jnp.where(valid, jnp.floor((wb + seg) / d), 0.0) \
        .astype(jnp.int32)
    cum_k = jnp.cumsum(k)
    total = cum_k[-1] if S else jnp.asarray(0, jnp.int32)
    total = jnp.minimum(total, jnp.asarray(1 << 30, jnp.int32))
    overflow = total > M
    j = jnp.arange(M)
    si = jnp.searchsorted(cum_k, j, side="right").astype(jnp.int32)
    si = jnp.minimum(si, S - 1)
    o = (j - (cum_k[si] - k[si])).astype(jnp.float32)
    seg_safe = jnp.maximum(seg[si], 1e-12)
    t = o * d / seg_safe
    out = p0[si] + (p1[si] - p0[si]) * t[:, None]
    m = jnp.minimum(total, M)
    out = jnp.where((j < m)[:, None], out, 0.0)
    return out, m, overflow


# ---------------------------------------------------------------------------
# smoothing / orientation / EFT / curvature
# ---------------------------------------------------------------------------

def _smooth(pts, L, spec: PostureSpec):
    """Triangular periodic smoothing (Outline.cpp:380-436)."""
    samples = spec.smooth_samples
    if samples <= 0:
        return pts
    step_row = int(samples * spec.smooth_step)
    if step_row < 1:
        return pts
    offs = np.arange(-step_row, step_row + 1, spec.smooth_step)
    w = (step_row - np.abs(offs)) / step_row
    w = (w / w.sum()).astype(np.float32)
    offs = jnp.asarray(offs, jnp.int32)
    w = jnp.asarray(w)
    M = pts.shape[0]
    Lc = jnp.maximum(L, 1)
    idx = jnp.mod(jnp.arange(M)[:, None] + offs[None, :], Lc)
    sm = jnp.sum(pts[idx] * w[None, :, None], axis=1)
    # host skips smoothing when L <= samples
    return jnp.where(L > samples, sm, pts)


def _make_clockwise(pts, L):
    """Positive signed area in image coordinates; reverse otherwise."""
    M = pts.shape[0]
    idx = jnp.arange(M)
    valid = idx < L
    nxt = jnp.where(idx + 1 >= L, 0, idx + 1)
    x, y = pts[:, 0], pts[:, 1]
    area = 0.5 * jnp.sum(jnp.where(valid,
                                   x * y[nxt] - x[nxt] * y, 0.0))
    rev = jnp.mod(L - 1 - idx, jnp.maximum(L, 1))
    return jnp.where(area < 0, pts[rev], pts)


def _eft_approx(pts, L, spec: PostureSpec):
    """outline_approximate > 0: replace the outline by its elliptic
    Fourier reconstruction (Outline.cpp:499-513; Kuhl & Giardina)."""
    H = spec.approximate
    if H <= 0:
        return pts
    M = pts.shape[0]
    idx = jnp.arange(M)
    valid = idx < L
    Lf = jnp.maximum(L, 3)
    center = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) \
        / jnp.maximum(L, 1).astype(jnp.float32)
    p = jnp.where(valid[:, None], pts - center[None, :], 0.0)
    nxt = jnp.where(idx + 1 >= L, 0, idx + 1)
    dvec = jnp.where(valid[:, None], p[nxt] - p, 0.0)
    dt = jnp.hypot(dvec[:, 0], dvec[:, 1])
    dt = jnp.where(dt == 0, 1e-12, dt)
    dt = jnp.where(valid, dt, 1e-12)
    t = jnp.concatenate([jnp.zeros(1), jnp.cumsum(
        jnp.where(valid, dt, 0.0))])
    T = t[-1]
    T = jnp.where(T <= 0, 1.0, T)
    nh = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None]
    phi = 2 * jnp.pi * nh * t[None, :] / T          # (H, M+1)
    # the edge ending at index i spans [t_i, t_{i+1}]
    ph0 = phi[:, :-1]
    ph1 = jnp.where(valid[None, :], phi[:, 1:], phi[:, :-1])
    dcos = jnp.cos(ph1) - jnp.cos(ph0)
    dsin = jnp.sin(ph1) - jnp.sin(ph0)
    c = T / (2 * (nh[:, 0] ** 2) * jnp.pi ** 2)
    vx = jnp.where(valid, dvec[:, 0] / dt, 0.0)
    vy = jnp.where(valid, dvec[:, 1] / dt, 0.0)
    a = c * jnp.sum(vx[None, :] * dcos, axis=1)
    b = c * jnp.sum(vx[None, :] * dsin, axis=1)
    cc = c * jnp.sum(vy[None, :] * dcos, axis=1)
    dd = c * jnp.sum(vy[None, :] * dsin, axis=1)
    # reconstruct L uniformly spaced points
    tt = T * idx.astype(jnp.float32) / jnp.maximum(
        L, 1).astype(jnp.float32)
    ph = 2 * jnp.pi * nh * tt[None, :] / T          # (H, M)
    x = center[0] + jnp.sum(a[:, None] * jnp.cos(ph)
                            + b[:, None] * jnp.sin(ph), axis=0)
    y = center[1] + jnp.sum(cc[:, None] * jnp.cos(ph)
                            + dd[:, None] * jnp.sin(ph), axis=0)
    rec = jnp.stack([x, y], axis=1)
    return jnp.where(L > 2, jnp.where(valid[:, None], rec, 0.0), pts)


def _tail_head(pts, L, spec: PostureSpec):
    """Menger curvature over the ratio window; tail = strongest local
    maximum, head = peak circularly farthest from the tail. Returns
    (tail i32, head i32, ok bool)."""
    M = pts.shape[0]
    idx = jnp.arange(M)
    valid = idx < L
    Lc = jnp.maximum(L, 1)
    rng = jnp.maximum(
        1, (spec.curvature_ratio
            * L.astype(jnp.float32)).astype(jnp.int32))
    i1 = jnp.mod(idx - rng, Lc)
    i3 = jnp.mod(idx + rng, Lc)
    p1, p2, p3 = pts[i1], pts, pts[i3]
    a = p2 - p1
    b = p3 - p2
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    d12 = jnp.hypot(a[:, 0], a[:, 1])
    d23 = jnp.hypot(b[:, 0], b[:, 1])
    d13 = jnp.hypot(p3[:, 0] - p1[:, 0], p3[:, 1] - p1[:, 1])
    denom = jnp.sqrt(jnp.maximum(d12 * d23 * d13, 1e-12))
    curv = jnp.where(valid, 2.0 * cross / denom, _NEG)
    left = curv[jnp.mod(idx - 1, Lc)]
    right = curv[jnp.mod(idx + 1, Lc)]
    peak = valid & (curv >= left) & (curv > right)
    any_peak = jnp.any(peak)
    tail = jnp.argmax(jnp.where(peak, curv, _NEG)).astype(jnp.int32)
    dist = jnp.abs(idx - tail)
    dist = jnp.minimum(dist, L - dist)
    head = jnp.argmax(jnp.where(peak, dist, -1)).astype(jnp.int32)
    return tail, head, any_peak


# ---------------------------------------------------------------------------
# midline walk + post-process + normalize
# ---------------------------------------------------------------------------

def _midline_walk(pts, L, spec: PostureSpec):
    """Pairing walk from the tail (Outline.cpp:768-866; mirrors
    track/posture._midline_walk_py). pts already rotated so the tail
    is index 0. Returns (segs (K, 2), heights (K,), m i32) with
    K = max_outline // 2 + 4.

    Both candidate windows are CONTIGUOUS index ranges, so they read
    via `lax.dynamic_slice` — vector gathers with loop-carried indices
    lower to per-iteration custom calls on the target backend (~2 ms
    each; measured), dynamic slices to cheap address arithmetic."""
    M = pts.shape[0]
    K = spec.max_outline // 2 + 4
    WCAP = int(spec.walk_offset * spec.max_outline) + 4
    max_off = jnp.maximum(
        3, (spec.walk_offset * L.astype(jnp.float32)).astype(jnp.int32))
    w = jnp.arange(WCAP, dtype=jnp.int32)
    # pad so a clamp-free window fits at either end
    pad = jnp.zeros((WCAP, 2), pts.dtype)
    pts_pad0 = jnp.concatenate([pts, pad], axis=0)  # (M + WCAP, 2)

    def cond(st):
        # the condition and body must read loop-INVARIANT inputs
        # (pts, L) through the CARRY: as closure operands the backend
        # rematerializes their whole producer chain inside the loop
        # body, costing ~2 ms/iteration (measured; neither
        # optimization_barrier nor cond boundaries stop it)
        idx_r, idx_l, m, _, _, guard, Lc_carry, _ = st
        return (idx_r < Lc_carry + idx_l) & (guard < 4 * Lc_carry) \
            & (m < K)

    def body(st):
        idx_r, idx_l, m, segs, hts, guard, Lc_carry, pts_pad = st

        def point(i):
            return jax.lax.dynamic_slice(
                pts_pad, (jnp.clip(i, 0, M - 1), 0), (1, 2))[0]
        # every upstream-invariant value the body needs derives from
        # the carried length (same recompute-per-iteration hazard as
        # the condition)
        L_ = Lc_carry
        max_off_ = jnp.maximum(
            3, (spec.walk_offset
                * L_.astype(jnp.float32)).astype(jnp.int32))
        # idx_l in [-L+1, -1] => L + idx_l in [1, L-1]: no wrap
        ptl = point(L_ + idx_l)
        # right window [idx_r, min(L, idx_r + max_off)), ascending
        hi = jnp.minimum(L_, idx_r + max_off_)
        win_r = jax.lax.dynamic_slice(
            pts_pad, (jnp.clip(idx_r, 0, M), 0), (WCAP, 2))
        okr = w < hi - idx_r
        ddr = jnp.where(okr, jnp.hypot(win_r[:, 0] - ptl[0],
                                       win_r[:, 1] - ptl[1]), _INF)
        idx_r2 = jnp.where(jnp.any(okr),
                           idx_r + jnp.argmin(ddr).astype(jnp.int32),
                           idx_r)
        ptr = point(idx_r2)
        # left window idx_l, idx_l-1, ... lo (inclusive, descending;
        # indices L+cand stay in [1, L-1]). Slice ascending from the
        # clamped start, then REVERSE so ties break like the host's
        # descending argmin
        lo = jnp.maximum(-L_ + 1, idx_l - max_off_ + 1)
        base_l = L_ + idx_l
        start_l = jnp.clip(base_l - (WCAP - 1), 0, M)
        win_l = jax.lax.dynamic_slice(pts_pad, (start_l, 0),
                                      (WCAP, 2))
        true_l = start_l + w - L_         # idx_l-space, ascending
        okl = (true_l >= lo) & (true_l <= idx_l)
        ddl = jnp.where(okl, jnp.hypot(win_l[:, 0] - ptr[0],
                                       win_l[:, 1] - ptr[1]), _INF)
        ddl_desc = ddl[::-1]
        kk = jnp.argmin(ddl_desc).astype(jnp.int32)
        idx_l2 = jnp.where(jnp.any(okl),
                           start_l + (WCAP - 1 - kk) - L_, idx_l)
        ptl2 = point(L_ + idx_l2)
        mid = (ptl2 + ptr) * 0.5
        h = jnp.hypot(ptr[0] - ptl2[0], ptr[1] - ptl2[1])
        segs = segs.at[m].set(mid)
        hts = hts.at[m].set(h)
        return (idx_r2 + 1, idx_l2 - 1, m + 1, segs, hts, guard + 1,
                Lc_carry, pts_pad)

    segs0 = jnp.zeros((K, 2), jnp.float32)
    hts0 = jnp.zeros(K, jnp.float32)
    _, _, m, segs, hts, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32),
                     jnp.asarray(-1, jnp.int32),
                     jnp.asarray(0, jnp.int32), segs0, hts0,
                     jnp.asarray(0, jnp.int32), L, pts_pad0))
    return segs, hts, m


def _midline_direction(segs, m, stiff_pct):
    """Midline.midline_direction: mean of the first
    max(1, m*stiff_pct) segment vectors, normalized."""
    K = segs.shape[0]
    n = jnp.maximum(1, (m.astype(jnp.float32)
                        * stiff_pct).astype(jnp.int32))
    idx = jnp.arange(K)
    use = (idx < n) & (idx + 1 < m)
    d = jnp.sum(jnp.where(use[:, None],
                          jnp.roll(segs, -1, axis=0) - segs, 0.0),
                axis=0)
    cnt = jnp.sum(use)
    d = jnp.where(cnt > 0, d / jnp.maximum(cnt, 1), d)
    norm = jnp.hypot(d[0], d[1])
    return jnp.where(norm > 0, d / norm, d)


def _stiff_variant(segs, hts, m, do_rev: bool, spec: PostureSpec):
    """One orientation variant of Midline::post_process's tail: the
    (static) reversal followed by stiff-percentage straightening
    (Outline.cpp:890-1010). The orientation DECISION (previous
    movement direction) is applied afterwards as an elementwise
    select between the two precomputed variants — that turns the
    per-frame posture recurrence into a trivially cheap scan and lets
    the expensive walk/straightening batch over every (frame, fish)
    lane at once. Stiff straightening preserves each segment's length,
    so the normalized midline LENGTH is variant-independent; the
    direction/angle are not."""
    K = segs.shape[0]
    idx = jnp.arange(K)
    if do_rev:
        rev = jnp.clip(m - 1 - idx, 0, K - 1)
        segs = segs[rev]
        hts = hts[rev]
    if spec.stiff_pct > 0:
        mf = m.astype(jnp.float32)
        center = jnp.minimum(
            m - 1, (jnp.round(mf * spec.stiff_pct)
                    + 1).astype(jnp.int32))
        center = jnp.maximum(center, 0)
        center_point = segs[jnp.clip(center, 0, K - 1)]
        extra = jnp.minimum(m, center + jnp.maximum(
            0.0, mf * 0.1).astype(jnp.int32))
        use = (idx >= center) & (idx < extra) & (idx + 1 < m)
        v = segs - jnp.roll(segs, -1, axis=0)
        nv = jnp.hypot(v[:, 0], v[:, 1])
        vn = jnp.where((nv > 0)[:, None], v / jnp.maximum(
            nv, 1e-12)[:, None], 0.0)
        axis = jnp.sum(jnp.where(use[:, None], vn, 0.0), axis=0)
        count = jnp.sum(use)
        axis = jnp.where(count > 0, axis / jnp.maximum(count, 1), axis)

        seg_len = jnp.hypot(segs[:, 0] - jnp.roll(segs, 1, 0)[:, 0],
                            segs[:, 1] - jnp.roll(segs, 1, 0)[:, 1])

        def sbody(st):
            i, segs = st
            p1 = segs[jnp.clip(i, 0, K - 1)]
            sl = seg_len[jnp.clip(i, 0, K - 1)]
            dtc = segs[jnp.clip(i - 1, 0, K - 1)] - center_point
            n1 = jnp.hypot(dtc[0], dtc[1])
            dtc = jnp.where(n1 > 0, dtc / jnp.maximum(n1, 1e-12), dtc)
            test = (dtc + axis) * 0.5
            n2 = jnp.hypot(test[0], test[1])
            test = jnp.where(n2 > 0, test / jnp.maximum(n2, 1e-12),
                             test)
            segs = segs.at[jnp.clip(i - 1, 0, K - 1)].set(
                p1 + sl * test)
            return i - 1, segs

        _, segs = jax.lax.while_loop(
            lambda st: st[0] > 0, sbody, (center, segs))
    return segs, hts


def _normalize_len(segs, m, spec: PostureSpec):
    """Midline::normalize's arc-length resample to midline_res points
    (Outline.cpp:1270-1408) + chord-sum length. Also returns the
    direction of the (post-processed) midline for the carry.
    Returns (ok, length)."""
    K = segs.shape[0]
    res = spec.midline_res
    idx = jnp.arange(K)
    valid_seg = idx + 1 < m
    d = jnp.roll(segs, -1, axis=0) - segs
    lens = jnp.where(valid_seg, jnp.hypot(d[:, 0], d[:, 1]), 0.0)
    raw_len = jnp.sum(lens)
    ok = (raw_len > 0) & (m > 2)
    step = raw_len / jnp.float32(res - 1)
    cum = jnp.cumsum(lens)
    # emission j (1..res-2) at arc position j*step, interpolated on
    # the containing segment; endpoints are segs[0] and segs[m-1]
    j = jnp.arange(1, res - 1, dtype=jnp.float32)
    pos = j * step
    si = jnp.searchsorted(cum, pos, side="left").astype(jnp.int32)
    si = jnp.clip(si, 0, K - 1)
    prev_cum = jnp.where(si > 0, cum[jnp.maximum(si - 1, 0)], 0.0)
    local = jnp.maximum(lens[si], 1e-12)
    t = (pos - prev_cum) / local
    pts_mid = segs[si] + d[si] * t[:, None]
    first = segs[0][None, :]
    last = segs[jnp.clip(m - 1, 0, K - 1)][None, :]
    red = jnp.concatenate([first, pts_mid, last], axis=0)  # (res, 2)
    dd = jnp.diff(red, axis=0)
    length = jnp.sum(jnp.hypot(dd[:, 0], dd[:, 1]))
    return ok, jnp.where(ok, length, 0.0)


# ---------------------------------------------------------------------------
# full chain per blob, with threshold escalation
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# chain through the walk (+ escalation) and the orientation select
# ---------------------------------------------------------------------------

def _chain_to_walk(diff, in_run, thr, spec: PostureSpec):
    """One threshold's outline -> midline WALK (everything orientation-
    independent). Returns (ok, segs (K, 2), hts (K,), mcnt, comp_px,
    overflow). ok mirrors the host's midline-succeeded condition
    (peaks exist, >2 walk segments, positive raw length — stiff
    straightening preserves segment lengths, so the normalize check is
    decidable here).

    The stages after each `lax.while_loop` sit behind data-dependent
    `lax.cond`s. Besides matching the host's early exits, the cond
    boundary is LOAD-BEARING for performance on the target backend:
    without it the loop optimizer sinks the downstream fusions INTO
    the preceding while's body, re-running the whole outline pipeline
    once per trace step (measured 62 ms/frame vs 0.05 on the same
    chip; optimization_barrier does NOT stop the sinking pass)."""
    K = spec.max_outline // 2 + 4
    keep = jnp.where(thr > 0, diff >= thr, in_run)
    dense, comp_px, ov1 = _biggest_component(keep, spec)

    def fail(ov):
        def f():
            return (jnp.bool_(False), jnp.zeros((K, 2), jnp.float32),
                    jnp.zeros(K, jnp.float32),
                    jnp.asarray(0, jnp.int32), ov)
        return f

    def after_cc():
        tr, n_tr, ov2 = _trace4(dense, spec)

        def after_trace():
            rs, L, ov3 = _resample(tr, n_tr, spec) \
                if spec.resample_d > 0 \
                else (tr, n_tr, jnp.bool_(False))
            enough = L >= 3
            sm = _smooth(rs, L, spec)
            cw = _make_clockwise(sm, L)
            ap = _eft_approx(cw, L, spec)
            tail, head, has_peak = _tail_head(ap, L, spec)
            Lc = jnp.maximum(L, 1)
            rot = ap[jnp.mod(jnp.arange(ap.shape[0]) + tail, Lc)]
            segs, hts, mcnt = _midline_walk(rot, L, spec)

            def after_walk():
                d = jnp.roll(segs, -1, axis=0) - segs
                lens = jnp.where(jnp.arange(K) + 1 < mcnt,
                                 jnp.hypot(d[:, 0], d[:, 1]), 0.0)
                ok = enough & has_peak & (jnp.sum(lens) > 0)
                return ok, segs, hts, mcnt, ov2 | ov3

            return jax.lax.cond(mcnt > 2, after_walk,
                                fail(ov2 | ov3))

        return jax.lax.cond(n_tr >= 3, after_trace, fail(ov2))

    ok, segs, hts, mcnt, ov_d = jax.lax.cond(
        comp_px >= 1, after_cc, fail(jnp.bool_(False)))
    return ok, segs, hts, mcnt, comp_px, ov1 | ov_d


def _escalate_to_walk(diff, in_run, npix, active, spec: PostureSpec):
    """Threshold escalation around _chain_to_walk
    (Posture.cpp:305-410: +2 per retry up to +100, stop when the
    midline succeeds or the biggest component drops under
    num_pixels/10). Returns (ok, segs, hts, mcnt, overflow)."""
    K = spec.max_outline // 2 + 4
    base = spec.threshold
    min_px = jnp.maximum(1, npix // 10)

    def body(st):
        _, thr, ok0, segs0, hts0, m0, alive, ov0 = st
        ok, segs, hts, mcnt, comp_px, ov = _chain_to_walk(
            diff, in_run, thr, spec)
        nonempty = comp_px >= 1
        ok = ok & nonempty
        alive2 = nonempty & ~ok & (comp_px >= min_px) \
            & (thr + 2 < base + 100)
        return (ok, thr + 2,
                ok | ok0,
                jnp.where(ok, segs, segs0),
                jnp.where(ok, hts, hts0),
                jnp.where(ok, mcnt, m0),
                alive2, ov0 | ov)

    st0 = (jnp.bool_(False), jnp.asarray(base, jnp.int32),
           jnp.bool_(False), jnp.zeros((K, 2), jnp.float32),
           jnp.zeros(K, jnp.float32), jnp.asarray(0, jnp.int32),
           active, jnp.bool_(False))
    st = jax.lax.while_loop(lambda st: (~st[0]) & st[6], body, st0)
    _, _, ok, segs, hts, mcnt, _, overflow = st
    return ok & active, segs, hts, mcnt, overflow & active


def _post_norm_both(segs, hts, mcnt, spec: PostureSpec):
    """Both orientation variants' post-process + normalize for one
    lane. Returns dict with dir_entry (2,) (the pre-reversal
    direction that drives the host's inversion decision) and per
    variant (fwd/rev): length, angle, dir."""
    dir_entry = _midline_direction(segs, mcnt, spec.stiff_pct)
    out = dict(dir_entry=dir_entry)
    for name, do_rev in (("fwd", False), ("rev", True)):
        s2, _ = _stiff_variant(segs, hts, mcnt, do_rev, spec)
        norm_ok, length = _normalize_len(s2, mcnt, spec)
        direction = _midline_direction(s2, mcnt, spec.stiff_pct)
        out[name] = dict(
            length=jnp.where(norm_ok, length, 0.0),
            angle=jnp.arctan2(direction[1], direction[0]),
            dir=direction, norm_ok=norm_ok)
    return out


def _orient_select(dir_entry, prev_move, fwd, rev,
                   spec: PostureSpec):
    """Midline::post_process's orientation decision as an elementwise
    select between the precomputed variants. All inputs may carry
    leading batch dims; prev_move is the movement direction the host
    passes (= -previous posture dir; zeros = none)."""
    needs0 = not spec.invert
    d = dir_entry if needs0 else -dir_entry
    mvn = jnp.hypot(prev_move[..., 0], prev_move[..., 1])
    mv = prev_move / jnp.maximum(mvn, 1e-12)[..., None]
    has_move = jnp.any(prev_move != 0, axis=-1) & (mvn > 0)
    dot = jnp.clip(jnp.sum(d * mv, axis=-1), -1.0, 1.0)
    flip = has_move & (jnp.arccos(-dot) < jnp.arccos(dot))
    needs_invert = jnp.where(flip, not needs0, needs0)
    do_rev = needs_invert != spec.start_with_head
    length = jnp.where(do_rev, rev["length"], fwd["length"])
    angle = jnp.where(do_rev, rev["angle"], fwd["angle"])
    direction = jnp.where(do_rev[..., None], rev["dir"], fwd["dir"])
    ok_n = jnp.where(do_rev, rev["norm_ok"], fwd["norm_ok"])
    return length, angle, direction, ok_n


def posture_blob(frame, background, bi, bx0i, by0i,
                 runs_y, runs_x0, runs_x1, runs_slot,
                 prev_move, active, spec: PostureSpec):
    """Posture of blob `bi` with threshold escalation
    (Posture.cpp:305-410). `active=False` lanes return immediately.
    Returns dict(ok, length, angle, dir (2,), overflow)."""
    diff, in_run, npix = _crop_blob(frame, background, bi, bx0i, by0i,
                                    runs_y, runs_x0, runs_x1,
                                    runs_slot, spec)
    ok, segs, hts, mcnt, overflow = _escalate_to_walk(
        diff, in_run, npix, active, spec)
    both = _post_norm_both(segs, hts, mcnt, spec)
    length, angle, direction, ok_n = _orient_select(
        both["dir_entry"], prev_move, both["fwd"], both["rev"], spec)
    ok = ok & ok_n
    return dict(ok=ok, length=jnp.where(ok, length, 0.0),
                angle=jnp.where(ok, angle, 0.0),
                dir=direction, overflow=overflow)


def make_posture_batch(spec: PostureSpec):
    """Vmapped per-blob posture with the (static) spec closed over —
    spec fields steer python-level branches, so it must not pass
    through vmap as a traced pytree."""
    def one(frame, background, bi, bx0i, by0i,
            runs_y, runs_x0, runs_x1, runs_slot, prev_move, active):
        return posture_blob(frame, background, bi, bx0i, by0i,
                            runs_y, runs_x0, runs_x1, runs_slot,
                            prev_move, active, spec)

    return jax.vmap(one, in_axes=(None, None, 0, 0, 0,
                                  None, None, None, None, 0, 0))


# ---------------------------------------------------------------------------
# chunk-batched posture: every (frame, fish) lane at once
# ---------------------------------------------------------------------------

def posture_lanes_batched(frames, background, bi, bx0, by0,
                          runs_y, runs_x0, runs_x1, runs_slot,
                          active, spec: PostureSpec):
    """Walk-inclusive chain for ALL (T, F) lanes in one batched
    program (double vmap), then both orientation variants per lane.

    Batching the chunk's lanes into ONE set of while loops is the
    performance design: on the target backend each while ITERATION
    carries a large fixed overhead regardless of lane count (measured
    ~2 ms/iteration at 256 lanes and the same at 16k), so running the
    walk once for 16k lanes instead of 64 times for 256 amortizes it
    64x. The orientation decision that couples consecutive frames is
    deferred to posture_select_scan (elementwise).

    frames (T, H, W); runs_* (T, R); bi/bx0/by0/active (T, F).
    Returns dict of (T, F[, ...]) arrays: ok, overflow, dir_entry,
    fwd/rev variants."""
    def lane(frame_img, ry, rx0, rx1, rslot, b, x0, y0, act):
        diff, in_run, npix = _crop_blob(frame_img, background, b,
                                        x0, y0, ry, rx0, rx1, rslot,
                                        spec)
        ok, segs, hts, mcnt, overflow = _escalate_to_walk(
            diff, in_run, npix, act, spec)
        both = _post_norm_both(segs, hts, mcnt, spec)
        return dict(ok=ok, overflow=overflow,
                    dir_entry=both["dir_entry"],
                    fwd=both["fwd"], rev=both["rev"])

    over_f = jax.vmap(lane, in_axes=(None, None, None, None, None,
                                     0, 0, 0, 0))
    over_tf = jax.vmap(over_f, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))
    return over_tf(frames, runs_y, runs_x0, runs_x1, runs_slot,
                   bi, bx0, by0, active)


def posture_select_scan(out, pdir0, spec: PostureSpec):
    """Frame-sequential orientation selection: walks the per-fish
    previous-midline-direction carry (engine._posture_dir) through
    the chunk, picking each lane's precomputed variant. Everything is
    elementwise — the scan body holds no loops.

    Returns (p_len, p_ang, p_ok (T, F), p_dir (T, F, 2), pdir_final)."""
    def step(pdir, x):
        length, angle, direction, ok_n = _orient_select(
            x["dir_entry"], -pdir, x["fwd"], x["rev"], spec)
        ok = x["ok"] & ok_n
        pdir2 = jnp.where(ok[:, None], direction, pdir)
        return pdir2, (jnp.where(ok, length, 0.0),
                       jnp.where(ok, angle, 0.0), ok, pdir2)

    pdir_final, (p_len, p_ang, p_ok, p_dir) = jax.lax.scan(
        step, pdir0, out)
    return p_len, p_ang, p_ok, p_dir, pdir_final
