"""Device-resident detection: batched background subtraction +
connected components + per-blob stats, fully on the TPU.

This is the device counterpart of the host path (native/labeling.cpp
via pipeline.detect_frame — the reference's RawProcessing +
CPULabeling, BackgroundSubtraction.cpp:126-347): a batch of frames goes
in, fixed-capacity per-frame blob tensors (centroid, pixel count,
track-threshold recount) come out, with no host synchronization between
stages. Groundwork for the fully device-resident tracking loop: the
outputs feed the vectorized (fish x blob) probability matrix directly.

Measured (TPU v5e, 1024x1024, batch 32, 2026-08-16): 4.9 frames/s for
the XLA min-propagation labeling (cc_device.label_components), which
converges in O(component S-turns) FULL-FRAME HBM passes and loses 8x
to the native host labeler (~40 fps end-to-end) at this resolution.
use_pallas=True now routes to cc_device.label_components_vmem — the
hierarchical answer: stripes converge to their local fixed point
entirely in VMEM (segmented min-scans on both axes + 8-neighbor min
per inner iteration), HBM traffic drops to one read+write per OUTER
iteration (one per stripe-crossing), and the pallas grid walks
(batch x stripes) so VMEM stays bounded at any batch size (the
straight vmap OOMed at 32). Interpret-mode differential tests pin it
to label_components / scipy; the real-chip fps lands with the bench's
device section (tunnel permitting).
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

    if use_pallas:
        # VMEM-resident stripe relaxation: the pallas grid walks
        # (batch x stripes) one VMEM block at a time, so batch size no
        # longer multiplies live VMEM (the straight vmap OOMed at 32)
        from .cc_device import label_components_vmem

        labels = label_components_vmem(
            mask, interpret=jax.default_backend() == "cpu")
    else:
        labels = jax.vmap(label_components)(mask)
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
