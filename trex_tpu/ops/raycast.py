"""Visual-field projection kernel (JAX, device-resident).

Re-creates track::VisualField (reference tracking/VisualField.{h,cpp}):
two eyes per fish, 512 angular bins over a symmetric 130-degree FOV,
two depth layers. The reference rasterizes every individual's tesselated
outline into each eye's angular bins with a depth test
(plot_projected_line, VisualField.cpp:96-150); here the same projection
is one batched scatter-min over (fish, eye, bin) segments — ideal for
the VPU: all-pairs angles/distances then segment_min reductions.

Layer 0: nearest object per bin. Layer 1: nearest object with a
different id than layer 0 and not the fish itself (VisualField.cpp
layer semantics, static_assert(layers == 2)).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FIELD_RESOLUTION = 512
SYMMETRIC_FOV = jnp.deg2rad(130.0)
INVALID = jnp.float32(3.4e38)


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

    seg = jnp.where(in_fov, bins + jnp.arange(E)[:, None] * n_bins, E * n_bins)
    depth = jnp.where(in_fov, dist, INVALID)

    flat_seg = seg.reshape(-1)
    flat_depth = depth.reshape(-1)
    flat_ids = jnp.broadcast_to(point_ids[None, :], (E, N)).reshape(-1)

    # layer 0: nearest per bin
    d0 = jax.ops.segment_min(flat_depth, flat_seg,
                             num_segments=E * n_bins + 1)[:-1]
    d0 = d0.reshape(E, n_bins)
    # recover the id at the minimum: points matching the min depth
    is_min = (flat_depth <= d0.reshape(-1)[flat_seg]) & (flat_seg < E * n_bins)
    id_or_big = jnp.where(is_min, flat_ids, jnp.int32(2 ** 30))
    i0 = jax.ops.segment_min(id_or_big, flat_seg,
                             num_segments=E * n_bins + 1)[:-1]
    i0 = i0.reshape(E, n_bins)

    # layer 1: nearest with id != layer0 id and id != own fish
    own = eye_fish[:, None]  # (E, 1)
    id_of_bin = i0.reshape(-1)[flat_seg]
    own_of_bin = jnp.repeat(own[:, 0], N)
    excluded = (flat_ids == id_of_bin) | (flat_ids == own_of_bin)
    depth2 = jnp.where(excluded, INVALID, flat_depth)
    d1 = jax.ops.segment_min(depth2, flat_seg,
                             num_segments=E * n_bins + 1)[:-1].reshape(E, n_bins)
    is_min1 = (depth2 <= d1.reshape(-1)[flat_seg]) & (flat_seg < E * n_bins)
    id1_or_big = jnp.where(is_min1, flat_ids, jnp.int32(2 ** 30))
    i1 = jax.ops.segment_min(id1_or_big, flat_seg,
                             num_segments=E * n_bins + 1)[:-1].reshape(E, n_bins)

    def fov_value(dd):
        v = (1.0 - jnp.clip(dd / max_d, 0.0, 1.0)) ** 2 * 255.0
        return jnp.where(dd >= INVALID, 0.0, v).astype(jnp.uint8)

    empty0 = d0 >= INVALID
    empty1 = d1 >= INVALID
    return {
        "depth0": jnp.where(empty0, INVALID, d0).reshape(F, 2, n_bins),
        "id0": jnp.where(empty0, -1, i0).reshape(F, 2, n_bins),
        "fov0": fov_value(d0).reshape(F, 2, n_bins),
        "depth1": jnp.where(empty1, INVALID, d1).reshape(F, 2, n_bins),
        "id1": jnp.where(empty1, -1, i1).reshape(F, 2, n_bins),
        "fov1": fov_value(d1).reshape(F, 2, n_bins),
    }
