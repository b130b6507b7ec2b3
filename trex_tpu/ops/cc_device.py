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

INACTIVE = jnp.int32(2 ** 30)


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


@partial(jax.jit, static_argnames=("max_blobs",))
def component_stats(labels: jax.Array, image: jax.Array,
                    max_blobs: int = 256):
    """Fixed-capacity per-component statistics from a label image.

    Returns dict with 'ids' (max_blobs, canonical label or -1), 'count',
    'sum_x', 'sum_y', 'sum_value' — padded device tensors ready for the
    downstream matching math.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    vals = image.reshape(-1).astype(jnp.float32)
    # unique canonical labels, padded with a sentinel above any label
    ids = jnp.unique(flat, size=max_blobs + 1, fill_value=INACTIVE)
    slot = jnp.searchsorted(ids, flat)
    fg = flat >= 0
    seg = jnp.where(fg, jnp.minimum(slot, max_blobs), max_blobs)
    ones = jnp.where(fg, 1.0, 0.0)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    n_seg = max_blobs + 1
    count = jax.ops.segment_sum(ones, seg, num_segments=n_seg)
    sum_x = jax.ops.segment_sum(xs * ones, seg, num_segments=n_seg)
    sum_y = jax.ops.segment_sum(ys * ones, seg, num_segments=n_seg)
    sum_v = jax.ops.segment_sum(vals * ones, seg, num_segments=n_seg)
    valid = (ids >= 0) & (ids < INACTIVE) & (count > 0)
    return {
        "ids": jnp.where(valid, ids, -1)[:max_blobs],
        "count": jnp.where(valid, count, 0.0)[:max_blobs],
        "sum_x": jnp.where(valid, sum_x, 0.0)[:max_blobs],
        "sum_y": jnp.where(valid, sum_y, 0.0)[:max_blobs],
        "sum_value": jnp.where(valid, sum_v, 0.0)[:max_blobs],
    }
