"""Device-side background subtraction (JAX).

The device half of the detection front end: batched over frames, static
shapes, pure elementwise — XLA fuses this with neighbors (e.g. crop
normalization or YOLO preprocessing). Semantics mirror the reference's
commons RawProcessing::generate_binary (usage BackgroundSubtraction.cpp:
126-347): output keeps the raw grayscale value where the foreground test
passes and 0 elsewhere; connected components then run over nonzero pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def subtract_absolute(frames: jax.Array, background: jax.Array,
                      threshold: jax.Array) -> jax.Array:
    """|frame - bg| >= threshold keeps the frame value. uint8 in/out.

    frames: (..., H, W) uint8; background: (H, W) uint8; threshold scalar.
    """
    d = jnp.abs(frames.astype(jnp.int16) - background.astype(jnp.int16))
    return jnp.where(d >= threshold, frames, 0).astype(jnp.uint8)


@jax.jit
def subtract_signed(frames: jax.Array, background: jax.Array,
                    threshold: jax.Array) -> jax.Array:
    """(bg - frame) >= threshold keeps the frame value (darker-than-bg)."""
    d = background.astype(jnp.int16) - frames.astype(jnp.int16)
    return jnp.where(d >= threshold, frames, 0).astype(jnp.uint8)


def subtract(frames, background, threshold, absolute: bool = True):
    fn = subtract_absolute if absolute else subtract_signed
    return fn(frames, background, jnp.asarray(threshold, jnp.int16))


@jax.jit
def foreground_mask(frames: jax.Array, background: jax.Array,
                    threshold: jax.Array, absolute: jax.Array) -> jax.Array:
    """Boolean foreground mask; `absolute` is a traced bool scalar."""
    fi = frames.astype(jnp.int16)
    bi = background.astype(jnp.int16)
    d = jnp.where(absolute, jnp.abs(fi - bi), bi - fi)
    # zero pixels never count as foreground (native labeling.cpp and
    # the device pipeline both apply row[x] != 0)
    return (d >= threshold) & (frames > 0)


@jax.jit
def running_mean(acc: jax.Array, frame: jax.Array, count: jax.Array):
    """One averaging step (float32 accumulator) — device-resident
    equivalent of AveragingAccumulator(mean)."""
    return acc + (frame.astype(jnp.float32) - acc) / count
