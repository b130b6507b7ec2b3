"""Device-resident detection: batched background subtraction +
connected components + per-blob stats, fully on the TPU.

This is the device counterpart of the host path (native/labeling.cpp
via pipeline.detect_frame — the reference's RawProcessing +
CPULabeling, BackgroundSubtraction.cpp:126-347): a batch of frames goes
in, fixed-capacity per-frame blob tensors (centroid, pixel count,
track-threshold recount) come out, with no host synchronization between
stages. Groundwork for the fully device-resident tracking loop: the
outputs feed the vectorized (fish x blob) probability matrix directly.

Measured (TPU v5e, 1024x1024, batch 32, 2026-08-16): 4.9 frames/s —
the iterative min-propagation labeling (cc_device.label_components)
converges in O(component diameter) full-frame passes and loses to the
native host labeler (~40 fps end-to-end) at this resolution. The
device CC needs a block-local union-find (Pallas) with hierarchical
merging before this path can beat the host; the Pallas neighbor-min
kernel also needs a batch grid (vmap currently OOMs VMEM at batch 32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cc_device import component_stats, label_components


@partial(jax.jit, static_argnames=("threshold", "track_threshold",
                                   "absolute", "max_blobs", "use_pallas"))
def detect_batch(frames: jax.Array, background: jax.Array,
                 threshold: int, track_threshold: int = 0,
                 absolute: bool = False, max_blobs: int = 512,
                 use_pallas: bool = False) -> dict:
    """Detect blobs in a batch of frames on device.

    frames:     (B, H, W) uint8
    background: (H, W) uint8
    threshold:  detect threshold vs background (absolute: |f-b|,
                signed: b-f — darker than background)
    track_threshold: optional second threshold whose per-blob pixel
                count is fused into the same pass (pv recount)

    Returns fixed-shape device tensors, one row per blob slot:
      cx, cy  (B, max_blobs) float32 centroids (nan for empty slots)
      count   (B, max_blobs) float32 pixel counts
      track_count (B, max_blobs) float32 recount at track_threshold
      valid   (B, max_blobs) bool
    """
    f = frames.astype(jnp.int16)
    b = background.astype(jnp.int16)[None]
    diff = jnp.abs(f - b) if absolute else (b - f)
    mask = (diff >= threshold) & (frames > 0)
    track_mask = ((diff >= track_threshold) & mask).astype(jnp.uint8) \
        if track_threshold > 0 else mask.astype(jnp.uint8)

    labels = jax.vmap(
        lambda m: label_components(m, use_pallas=use_pallas))(mask)
    stats = jax.vmap(
        lambda l, tm: component_stats(l, tm, max_blobs=max_blobs)
    )(labels, track_mask)

    count = stats["count"]
    valid = count > 0
    cx = jnp.where(valid, stats["sum_x"] / jnp.maximum(count, 1.0),
                   jnp.nan)
    cy = jnp.where(valid, stats["sum_y"] / jnp.maximum(count, 1.0),
                   jnp.nan)
    return {
        "cx": cx,
        "cy": cy,
        "count": count,
        "track_count": stats["sum_value"],
        "valid": valid,
    }
