"""Device-resident connected components (JAX + Pallas).

The host pipeline labels blobs in native C++ (ops/labeling.py); when
frames already live on the TPU (batched detection, the 256-fish
device pipeline) this module labels them without a host round-trip.

Algorithm: iterative label propagation with run-accelerated sweeps —
each iteration propagates the minimum label along horizontal runs
(forward+backward masked cummin, one associative scan) and then across
the 8-neighborhood (one Pallas VPU pass). Convergence needs one
iteration per "S-turn" of a component, not per pixel of diameter, so
animal-shaped blobs converge in a handful of sweeps.

Labels are linear indices of each component's first pixel in scan order
— the same canonical representative the host labeler produces, so both
paths agree on component identity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INACTIVE = jnp.int32(2 ** 30)
# plain-int twin for pallas kernel bodies (a jnp scalar would be a
# captured constant, which pallas_call rejects)
_INACT = 2 ** 30


def _row_run_min(labels: jax.Array, fg: jax.Array) -> jax.Array:
    """Min label within each horizontal run of foreground pixels."""

    def combine(a, b):
        # segmented min-scan: (value, segment-start flag);
        # combine = (fb ? vb : min(va, vb), fa | fb)
        av, astart = a
        bv, bstart = b
        v = jnp.where(bstart, bv, jnp.minimum(av, bv))
        return v, astart | bstart

    start = ~fg | jnp.concatenate(
        [jnp.ones_like(fg[:, :1]), ~fg[:, :-1]], axis=1)
    fwd, _ = jax.lax.associative_scan(combine, (labels, start), axis=1)
    rstart = ~fg | jnp.concatenate(
        [~fg[:, 1:], jnp.ones_like(fg[:, :1])], axis=1)
    bwd, _ = jax.lax.associative_scan(
        combine, (labels[:, ::-1], rstart[:, ::-1]), axis=1)
    bwd = bwd[:, ::-1]
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, INACTIVE)


def _neighbor_min_kernel(lab_ref, out_ref):
    """Pallas kernel: 8-neighborhood minimum over a padded label tile."""
    x = lab_ref[:]
    m = x
    # vertical + diagonal shifts; the lane dimension handles l/r shifts
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            shifted = x
            if dy:
                shifted = jnp.roll(shifted, dy, axis=0)
            if dx:
                shifted = jnp.roll(shifted, dx, axis=1)
            m = jnp.minimum(m, shifted)
    out_ref[:] = m


def _neighbor_min(labels_padded: jax.Array, use_pallas: bool) -> jax.Array:
    if use_pallas:
        return pl.pallas_call(
            _neighbor_min_kernel,
            out_shape=jax.ShapeDtypeStruct(labels_padded.shape, jnp.int32),
        )(labels_padded)
    m = labels_padded
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.minimum(m, jnp.roll(jnp.roll(labels_padded, dy, 0),
                                        dx, 1))
    return m


@partial(jax.jit, static_argnames=("max_iters", "use_pallas"))
def label_components(mask: jax.Array, max_iters: int = 64,
                     use_pallas: bool = False) -> jax.Array:
    """Label the connected components (8-connectivity) of a binary mask.

    Returns int32 (H, W): background = -1; each component carries the
    linear index of its first pixel in scan order.
    """
    fg = mask > 0
    h, w = fg.shape
    init = jnp.where(
        fg,
        jnp.arange(h * w, dtype=jnp.int32).reshape(h, w),
        INACTIVE,
    )

    def step(state):
        labels, _ = state
        run = _row_run_min(labels, fg)
        padded = jnp.pad(run, 1, constant_values=INACTIVE)
        nm = _neighbor_min(padded, use_pallas)[1:-1, 1:-1]
        new = jnp.where(fg, jnp.minimum(run, nm), INACTIVE)
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, lambda s: step(s), (init, jnp.bool_(True)))
    return jnp.where(fg, labels, -1)


# ---------------------------------------------------------------------------
# VMEM-resident stripe relaxation (the fast path)
# ---------------------------------------------------------------------------
#
# label_components above reads and writes the full frame through HBM
# once per propagation step — measured at 4.9 fps for 1024^2 x 32 on a
# v5e, losing 8x to the host labeler (see ops/device_pipeline.py). The
# striped kernel below keeps a whole (SH, W) stripe of labels resident
# in VMEM and iterates to the stripe-local fixed point there: each
# inner iteration runs segmented min-scans along BOTH axes (full-run
# propagation, log2-depth roll/select ladders on the VPU) plus an
# 8-neighbor min, all without touching HBM. Cross-stripe propagation
# rides one-row halos refreshed by an outer XLA fixed-point loop, so
# the number of HBM sweeps drops from O(component S-turns) to
# O(stripes a component spans) — and the grid dimension walks the
# batch one stripe at a time, bounding VMEM use independently of batch
# size (the straight vmap of label_components OOMs VMEM at batch 32).

def _seg_min_scan(v, head, idx, n, axis, dirn):
    """Inclusive segmented min-scan (Hillis-Steele): v_i' = min of v
    over the positions back to the last head flag, scanning along
    `axis` in the `dirn` (+1 left-to-right, -1 right-to-left) index
    direction. `idx` is the broadcasted index along `axis`;
    out-of-range predecessors act as boundaries. No reversals (Mosaic
    has no negative-stride slicing) and flags are int32 0/1, never
    rolled bools (Mosaic cannot truncate rolled i8 vectors to i1)."""
    k = 1
    while k < n:
        vk = jnp.roll(v, dirn * k, axis)
        hk = jnp.roll(head, dirn * k, axis)
        ok = (idx >= k) if dirn > 0 else (idx < n - k)
        vk = jnp.where(ok, vk, _INACT)
        hk = jnp.where(ok, hk, 1)
        v = jnp.where(head > 0, v, jnp.minimum(v, vk))
        head = jnp.maximum(head, hk)
        k *= 2
    return v


def _run_min_2d(lab, fi, row, col, SH, W):
    """Min label over each pixel's full horizontal AND vertical
    foreground run (both directions), _INACT on background. `fi` is
    the int32 0/1 foreground mask."""
    f = fi > 0
    v = jnp.where(f, lab, _INACT)
    one = jnp.int32(1)

    def head_flags(shift_axis, edge):
        # run heads for a scan: bg pixels, the scan-edge line, and
        # pixels whose predecessor along the scan is bg (the roll
        # wraps, but the edge term covers the wrapped line)
        fprev = jnp.roll(fi, edge, shift_axis)
        idx = col if shift_axis == 1 else row
        n = W if shift_axis == 1 else SH
        at_edge = (idx == 0) if edge == 1 else (idx == n - 1)
        b = (~f) | at_edge | (fprev == 0)
        return b.astype(jnp.int32) * one

    fwd = _seg_min_scan(v, head_flags(1, 1), col, W, 1, +1)
    bwd = _seg_min_scan(v, head_flags(1, -1), col, W, 1, -1)
    vfwd = _seg_min_scan(v, head_flags(0, 1), row, SH, 0, +1)
    vbwd = _seg_min_scan(v, head_flags(0, -1), row, SH, 0, -1)
    out = jnp.minimum(jnp.minimum(fwd, bwd), jnp.minimum(vfwd, vbwd))
    return jnp.where(f, out, _INACT)


def _stripe_kernel(SH: int, W: int, inner_cap: int):
    def kernel(lab_ref, fg_ref, halo_ref, out_ref):
        lab0 = lab_ref[0]
        fi = fg_ref[0]
        f = fi > 0
        top = halo_ref[0, 0, 0:1]   # (1, W) labels of the row above
        bot = halo_ref[0, 0, 1:2]   # (1, W) labels of the row below
        row = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (SH, W), 1)
        ecol = jax.lax.broadcasted_iota(jnp.int32, (SH + 2, W), 1)

        def neighbor_min(cur):
            ext = jnp.concatenate([top, cur, bot], axis=0)
            m = jnp.full((SH, W), _INACT)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    sh = ext
                    if dx:
                        sh = jnp.roll(sh, dx, 1)
                        edge = (ecol < dx) if dx > 0 \
                            else (ecol >= W + dx)
                        sh = jnp.where(edge, _INACT, sh)
                    m = jnp.minimum(m, sh[1 + dy:1 + dy + SH])
            return m

        def body(state):
            cur, _, it = state
            new = jnp.minimum(_run_min_2d(cur, fi, row, col, SH, W),
                              neighbor_min(cur))
            new = jnp.where(f, new, _INACT)
            return new, jnp.any(new != cur), it + 1

        def cond(state):
            return state[1] & (state[2] < inner_cap)

        final, _, _ = jax.lax.while_loop(
            cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))
        out_ref[0] = final

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("stripe_h", "inner_cap",
                                   "interpret"))
def label_components_vmem(mask: jax.Array, stripe_h: int = None,
                          inner_cap: int = 24,
                          interpret: bool = False) -> jax.Array:
    """Batched 8-connectivity labeling with VMEM-resident stripes.

    mask: (B, H, W). Returns (B, H, W) int32: background -1, each
    component the linear index (y * W + x) of its first pixel in scan
    order — bit-identical partition representative to
    label_components and the host labeler.
    """
    fg = mask > 0
    B, H, W = fg.shape
    Wp = _round_up(W, 128)
    if stripe_h is None:
        # Mosaic's measured live set for this kernel is ~17
        # stripe-sized i32 buffers (scan ladder temporaries + loop
        # carries; a 304-row stripe at W=1024 wanted 20.89 MB of the
        # 16 MB scoped VMEM) — budget 20 buffers in 12 MB
        budget = 12 * 1024 * 1024 // (20 * 4 * Wp)
        stripe_h = max(8, min(_round_up(H, 8), budget // 8 * 8))
    SH = stripe_h
    Hp = _round_up(H, SH)
    n_stripes = Hp // SH
    lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    lin = jnp.pad(lin, ((0, Hp - H), (0, Wp - W)))
    fgp = jnp.pad(fg, ((0, 0), (0, Hp - H), (0, Wp - W)))
    init = jnp.where(fgp, lin[None], _INACT)
    fgi = fgp.astype(jnp.int32)

    grid = (B, n_stripes)
    blk = pl.BlockSpec((1, SH, Wp), lambda b, i: (b, i, 0))
    call = pl.pallas_call(
        _stripe_kernel(SH, Wp, inner_cap),
        grid=grid,
        in_specs=[
            blk,                                     # labels
            blk,                                     # fg
            # stripe halos, pre-gathered to (B, n_stripes, 2, Wp) so
            # the block's last two dims EQUAL the array's (Mosaic
            # rejects sub-(8, 128) blocks otherwise): row 0 = the row
            # above the stripe, row 1 = the row below
            pl.BlockSpec((1, 1, 2, Wp), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.int32),
        interpret=interpret,
    )

    def outer(state):
        labels, _ = state
        padded = jnp.pad(labels, ((0, 0), (1, 1), (0, 0)),
                         constant_values=_INACT)
        tops = padded[:, 0:Hp:SH, :]        # original rows i*SH - 1
        bots = padded[:, SH + 1::SH, :]     # original rows (i+1)*SH
        halos = jnp.stack([tops, bots], axis=2)
        new = call(labels, fgi, halos)
        # fixed-point check in XLA (Mosaic rejects sub-(8, 128) scalar
        # output blocks, so the kernel has no per-stripe flag)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], outer, (init, jnp.bool_(True)))
    labels = labels[:, :H, :W]
    return jnp.where(fg[:, :H, :W], labels, -1)


@partial(jax.jit, static_argnames=("max_blobs",))
def component_stats(labels: jax.Array, image: jax.Array,
                    max_blobs: int = 256):
    """Fixed-capacity per-component statistics from a label image.

    PRECONDITION: labels must be CANONICAL first-pixel linear indices
    — a component's label equals the flat position of its first pixel
    (what label_components produces). Any other convention (e.g.
    scipy's 1..n) yields zero representatives and therefore zero
    blobs, silently.

    Returns dict with 'ids' (max_blobs, canonical label or -1), 'count',
    'sum_x', 'sum_y', 'sum_value' — padded device tensors ready for the
    downstream matching math.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    vals = image.reshape(-1).astype(jnp.float32)
    fg = flat >= 0
    # Labels are canonical first-pixel linear indices, so a pixel is
    # its component's REPRESENTATIVE iff its label equals its own
    # position — slots are the cumsum rank of representatives in scan
    # order (identical ascending order to the sorted-unique this
    # replaces, whose 1M-element bitonic sorts dominated the whole
    # detection pass on a v5e: 1097 ms/call -> the scan+gather here).
    n = flat.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    rep = flat == pos
    rank = jnp.cumsum(rep.astype(jnp.int32)) - 1
    rep_slot = jnp.where(rep, jnp.minimum(rank, max_blobs), max_blobs)
    ids = jnp.full(max_blobs + 1, INACTIVE, jnp.int32) \
        .at[rep_slot].set(pos, mode="drop")
    ids = ids.at[max_blobs].set(INACTIVE)
    # each pixel's slot = its representative's slot (gather at the
    # label position)
    seg = jnp.where(fg, rep_slot[jnp.clip(flat, 0, n - 1)], max_blobs)
    ones = jnp.where(fg, 1.0, 0.0)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    n_seg = max_blobs + 1
    # all four accumulations ride ONE chunked one-hot contraction on
    # the MXU instead of four scatter-add segment_sums (each ~10 ms
    # per 1M pixels on a v5e; the dot evaluates the same f32 sums in
    # ~9 ms TOTAL). HIGHEST precision keeps f32 accumulation — counts
    # and integer-coordinate sums stay exact below 2^24 like before.
    # lax.scan over chunks bounds the materialized one-hot to one
    # (CH, n_seg) block regardless of image or vmap batch size.
    feats = jnp.stack([ones, xs * ones, ys * ones, vals * ones], 1)
    CH = 8192
    npad = _round_up(n, CH)
    if npad != n:
        seg = jnp.concatenate(
            [seg, jnp.full(npad - n, max_blobs, seg.dtype)])
        feats = jnp.concatenate(
            [feats, jnp.zeros((npad - n, 4), feats.dtype)])

    def chunk(acc, args):
        segc, fc = args
        oh = (segc[:, None] == jnp.arange(n_seg)[None, :]) \
            .astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, fc, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST), None

    sums, _ = jax.lax.scan(
        chunk, jnp.zeros((n_seg, 4), jnp.float32),
        (seg.reshape(-1, CH), feats.reshape(-1, CH, 4)))
    count, sum_x, sum_y, sum_v = (sums[:, 0], sums[:, 1],
                                  sums[:, 2], sums[:, 3])
    valid = (ids >= 0) & (ids < INACTIVE) & (count > 0)
    return {
        "ids": jnp.where(valid, ids, -1)[:max_blobs],
        "count": jnp.where(valid, count, 0.0)[:max_blobs],
        "sum_x": jnp.where(valid, sum_x, 0.0)[:max_blobs],
        "sum_y": jnp.where(valid, sum_y, 0.0)[:max_blobs],
        "sum_value": jnp.where(valid, sum_v, 0.0)[:max_blobs],
    }
