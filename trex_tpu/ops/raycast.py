"""Visual-field projection kernel (JAX, device-resident).

Re-creates track::VisualField (reference tracking/VisualField.{h,cpp}):
two eyes per fish, 512 angular bins over a symmetric 130-degree FOV,
two depth layers. The reference rasterizes every individual's tesselated
outline into each eye's angular bins with a depth test
(plot_projected_line, VisualField.cpp:96-150).

TPU formulation: per (eye, point) pack (bin, quantized depth, owner id)
into one int32 sort key; a single per-eye sort makes the first entry of
every bin run the nearest point (with its id); bin starts resolve with a
vectorized searchsorted. Layer 1 re-sorts with the layer-0 id and the
eye's own fish excluded. Two sorts replace five scatter/gather passes
(~3x faster than the segment_min formulation on TPU v5e at 256 fish;
a Pallas binned-min kernel is the tracked next step).

Depth is quantized to max_d/8192 (sub-0.2 px for typical arenas).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FIELD_RESOLUTION = 512
SYMMETRIC_FOV = jnp.deg2rad(130.0)
INVALID = jnp.float32(3.4e38)

_DEPTH_BITS = 13  # 8192 levels
_ID_BITS = 9  # up to 512 fish


@partial(jax.jit, static_argnames=("n_bins",))
def visual_field(points: jax.Array, point_ids: jax.Array,
                 point_valid: jax.Array, eye_pos: jax.Array,
                 eye_angle: jax.Array, max_d: jax.Array,
                 n_bins: int = FIELD_RESOLUTION):
    """Compute two-layer visual fields.

    points:      (N, 2) float32 — tesselated outline points, all fish
    point_ids:   (N,)  int32    — owning fish id per point
    point_valid: (N,)  bool     — padding mask
    eye_pos:     (F, 2, 2) float32
    eye_angle:   (F, 2) float32 — eye view directions (radians)
    max_d:       scalar float32 — arena diagonal for the fov falloff

    Returns dict of (F, 2, n_bins) arrays: depth0/1, id0/1, fov0/1.
    """
    F = eye_pos.shape[0]
    N = points.shape[0]
    E = F * 2

    epos = eye_pos.reshape(E, 2)
    eang = eye_angle.reshape(E)
    eye_fish = jnp.repeat(jnp.arange(F, dtype=jnp.int32), 2)

    d = points[None, :, :] - epos[:, None, :]  # (E, N, 2)
    dist = jnp.hypot(d[..., 0], d[..., 1])
    ang = jnp.arctan2(d[..., 1], d[..., 0]) - eang[:, None]
    ang = jnp.mod(ang + jnp.pi, 2 * jnp.pi) - jnp.pi
    in_fov = (jnp.abs(ang) <= SYMMETRIC_FOV) & point_valid[None, :]
    bins = ((ang + SYMMETRIC_FOV) / (2 * SYMMETRIC_FOV)
            * n_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, n_bins - 1)

    depth_levels = (1 << _DEPTH_BITS) - 1
    dq = jnp.clip((dist / max_d * depth_levels), 0,
                  depth_levels).astype(jnp.int32)
    ids = jnp.broadcast_to(point_ids[None, :], (E, N))

    def keys_for(extra_invalid):
        invalid = ~in_fov | extra_invalid
        b = jnp.where(invalid, n_bins, bins)  # overflow bin sorts last
        return ((b << (_DEPTH_BITS + _ID_BITS))
                | (jnp.where(invalid, depth_levels, dq) << _ID_BITS)
                | jnp.where(invalid, 0, ids)).astype(jnp.int32)

    bin_queries = (jnp.arange(n_bins, dtype=jnp.int32)
                   << (_DEPTH_BITS + _ID_BITS))

    def layer(keys):
        skeys = jnp.sort(keys, axis=-1)  # (E, N)
        idx = jax.vmap(lambda row: jnp.searchsorted(row, bin_queries))(skeys)
        idx = jnp.clip(idx, 0, N - 1)
        found = jnp.take_along_axis(skeys, idx, axis=-1)  # (E, n_bins)
        fbin = found >> (_DEPTH_BITS + _ID_BITS)
        hit = fbin == jnp.arange(n_bins, dtype=jnp.int32)[None, :]
        fdq = (found >> _ID_BITS) & depth_levels
        fid = found & ((1 << _ID_BITS) - 1)
        depth = jnp.where(hit, fdq.astype(jnp.float32) / depth_levels
                          * max_d, INVALID)
        fish = jnp.where(hit, fid, -1)
        return depth, fish

    d0, i0 = layer(keys_for(jnp.zeros_like(in_fov)))
    # layer 1: exclude points of the layer-0 winner and of the fish
    # itself (VisualField.cpp layer semantics)
    id_at_bin = jnp.take_along_axis(
        i0, bins.clip(0, n_bins - 1), axis=-1)  # (E, N): layer0 id per pt
    excluded = (ids == id_at_bin) | (ids == eye_fish[:, None])
    d1, i1 = layer(keys_for(excluded))

    def fov_value(dd):
        v = (1.0 - jnp.clip(dd / max_d, 0.0, 1.0)) ** 2 * 255.0
        return jnp.where(dd >= INVALID, 0.0, v).astype(jnp.uint8)

    return {
        "depth0": d0.reshape(F, 2, n_bins),
        "id0": i0.reshape(F, 2, n_bins),
        "fov0": fov_value(d0).reshape(F, 2, n_bins),
        "depth1": d1.reshape(F, 2, n_bins),
        "id1": i1.reshape(F, 2, n_bins),
        "fov1": fov_value(d1).reshape(F, 2, n_bins),
    }
