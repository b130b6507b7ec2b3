"""Visual-field projection kernel (JAX, device-resident).

Re-creates track::VisualField (reference tracking/VisualField.{h,cpp}):
two eyes per fish, 512 angular bins over a symmetric 130-degree FOV,
two depth layers. The reference rasterizes every individual's tesselated
outline into each eye's angular bins with a depth test
(plot_projected_line, VisualField.cpp:96-150).

TPU formulation: per (eye, point) pack (quantized depth, owner id)
into one int32 key; ONE flat segment_min over all E*N points into
E*n_bins segments gives the nearest point + id per bin. Layer 1
re-reduces with the layer-0 winner and the eye's own fish excluded.
(Measured on v5e at 256 fish: the flat segment_min is ~100x faster
than a per-eye bitonic sort and ~1000x faster than a vmapped per-eye
segment_min — issue scatter reductions as one large op.)

Depth is quantized to max_d/8192 (sub-0.2 px for typical arenas).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

FIELD_RESOLUTION = 512
# python float, NOT a device scalar: rank-0 device constants captured
# into jit programs cause a host round-trip per execution on the axon
# relay backend (~150 ms each; measured 4000x slowdown)
SYMMETRIC_FOV = math.radians(130.0)
INVALID = 3.4e38

_DEPTH_BITS = 13  # 8192 levels
_ID_BITS = 9  # up to 512 fish


def visual_field(points, point_ids, point_valid, eye_pos, eye_angle,
                 max_d, n_bins: int = FIELD_RESOLUTION):
    """API wrapper: converts the validity mask to int32 and the arena
    scale to a static python float before entering jit — bool array
    inputs and rank-0 scalar arguments each trigger a per-call host
    sync on the axon relay backend."""
    return _visual_field(
        jnp.asarray(points), jnp.asarray(point_ids),
        jnp.asarray(np.asarray(point_valid).astype(np.int32)),
        jnp.asarray(eye_pos), jnp.asarray(eye_angle),
        float(max_d), n_bins)


@partial(jax.jit, static_argnames=("n_bins", "max_d"))
def _visual_field(points: jax.Array, point_ids: jax.Array,
                  point_valid: jax.Array, eye_pos: jax.Array,
                  eye_angle: jax.Array, max_d: float,
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
    in_fov = (jnp.abs(ang) <= SYMMETRIC_FOV) & (point_valid[None, :] > 0)
    bins = ((ang + SYMMETRIC_FOV) / (2 * SYMMETRIC_FOV)
            * n_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, n_bins - 1)

    depth_levels = (1 << _DEPTH_BITS) - 1
    dq = jnp.clip((dist / max_d * depth_levels), 0,
                  depth_levels).astype(jnp.int32)
    ids = jnp.broadcast_to(point_ids[None, :], (E, N))

    eye_base = jnp.arange(E, dtype=jnp.int32)[:, None] * n_bins
    big = jnp.int32(2 ** 30)

    def layer(extra_invalid):
        """Min (depth, id) key per (eye, bin) as ONE flat segment_min
        over all E*N points into E*n_bins segments — ~100x faster than
        a per-eye bitonic sort on TPU v5e (scatter reductions lower
        well when issued as a single large op; a vmapped per-eye
        segment_min does not). Invalid points carry the `big` sentinel
        and lose every min."""
        invalid = ~in_fov | extra_invalid
        kval = jnp.where(invalid, big, (dq << _ID_BITS) | ids)
        seg = (eye_base + jnp.where(invalid, 0, bins)).reshape(-1)
        found = jax.ops.segment_min(
            kval.reshape(-1), seg,
            num_segments=E * n_bins).reshape(E, n_bins)
        hit = found < big
        fdq = found >> _ID_BITS
        fid = found & ((1 << _ID_BITS) - 1)
        depth = jnp.where(hit, fdq.astype(jnp.float32) / depth_levels
                          * max_d, INVALID)
        fish = jnp.where(hit, fid, -1)
        return depth, fish

    d0, i0 = layer(jnp.zeros_like(in_fov))
    # layer 1: exclude points of the layer-0 winner and of the fish
    # itself (VisualField.cpp layer semantics)
    id_at_bin = jnp.take_along_axis(
        i0, bins.clip(0, n_bins - 1), axis=-1)  # (E, N): layer0 id per pt
    excluded = (ids == id_at_bin) | (ids == eye_fish[:, None])
    d1, i1 = layer(excluded)

    def fov_value(dd):
        # VisualField.cpp: fov = (1 - d/max_d)^2 * 255 with d the
        # SQUARED distance and max_d = cols^2 + rows^2, i.e.
        # (1 - (dist/diag)^2)^2 here (dd and max_d are linear)
        r2 = jnp.clip((dd / max_d) ** 2, 0.0, 1.0)
        v = (1.0 - r2) ** 2 * 255.0
        return jnp.where(dd >= INVALID, 0.0, v).astype(jnp.uint8)

    return {
        "depth0": d0.reshape(F, 2, n_bins),
        "id0": i0.reshape(F, 2, n_bins),
        "fov0": fov_value(d0).reshape(F, 2, n_bins),
        "depth1": d1.reshape(F, 2, n_bins),
        "id1": i1.reshape(F, 2, n_bins),
        "fov1": fov_value(d1).reshape(F, 2, n_bins),
    }
