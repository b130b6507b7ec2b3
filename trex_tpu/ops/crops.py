"""Identity-crop normalization.

Re-creates the reference's training-image generation
(individual_image_normalization in {none, moments, posture, legacy} —
core/default_config.cpp:1089; implementation ImageExtractor.cpp:155-270 +
commons constraints::diff_image used by TrainingData.cpp:1163):

- diff image: luminance-normalized (background - pixel) values under the
  blob mask
- alignment: rotate by the posture midline transform (posture) or the
  blob's image-moments orientation (moments)
- scale: median-midline-length scaling (posture), `individual_image_scale`
- pad/crop to `individual_image_size` (80x80) centered on the centroid

The heavy per-crop warp runs on host via cv2 (cheap, per blob); batched
device-side bilinear sampling is provided for the TPU pipeline
(`warp_crops_device`).
"""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from functools import partial

import jax
import jax.numpy as jnp

from ..track.blob import TrackBlob


def diff_image(blob: TrackBlob, background: np.ndarray,
               pad: int = 0) -> tuple[np.ndarray, tuple]:
    """(bg - pixel) luminance difference crop, 0 outside the mask."""
    mask, gray, (ox, oy) = blob.to_dense(pad=pad)
    h, w = gray.shape
    bg = np.zeros_like(gray)
    bh, bw = background.shape[:2]
    ys0, ys1 = max(0, oy), min(bh, oy + h)
    xs0, xs1 = max(0, ox), min(bw, ox + w)
    bg[ys0 - oy : ys1 - oy, xs0 - ox : xs1 - ox] = background[ys0:ys1, xs0:xs1]
    diff = np.clip(bg.astype(np.int16) - gray.astype(np.int16), 0, 255)
    diff = np.where(mask > 0, diff, 0).astype(np.uint8)
    return diff, (ox, oy)


def normalized_crop(blob: TrackBlob, background: np.ndarray,
                    settings, midline=None,
                    median_midline_length: Optional[float] = None,
                    mode: Optional[str] = None,
                    raw: bool = False) -> np.ndarray:
    """One (H, W) uint8 normalized identity crop."""
    s = settings
    mode = mode or s["individual_image_normalization"]
    size = s["individual_image_size"]
    tw, th = int(size[0]), int(size[1])
    scale = float(s["individual_image_scale"] or 1.0)

    if raw:
        # original-video appearance (tracklet_force_normal_color):
        # the blob's grey pixels instead of the background difference
        _, grey, (ox, oy) = blob.to_dense(pad=2)
        diff = grey
    else:
        diff, (ox, oy) = diff_image(blob, background, pad=2)
    cx, cy = blob.center
    cx -= ox
    cy -= oy

    angle = 0.0
    if mode == "posture" and midline is not None:
        angle = -midline.angle
    elif mode in ("moments", "legacy"):
        angle = -blob.orientation
    if mode == "posture" and midline is not None \
            and median_midline_length and midline.len > 0:
        scale *= median_midline_length / midline.len

    if cv2 is None:
        out = np.zeros((th, tw), np.uint8)
        sy, sx = diff.shape
        y0 = max(0, (th - sy) // 2)
        x0 = max(0, (tw - sx) // 2)
        out[y0 : y0 + min(sy, th), x0 : x0 + min(sx, tw)] = \
            diff[: min(sy, th), : min(sx, tw)]
        return out

    m = cv2.getRotationMatrix2D((float(cx), float(cy)),
                                math.degrees(angle), scale)
    m[0, 2] += tw / 2 - cx
    m[1, 2] += th / 2 - cy
    return cv2.warpAffine(diff, m, (tw, th), flags=cv2.INTER_LINEAR,
                          borderValue=0)


def crops_for_individual(ind, tracker, settings, frames=None,
                         median_midline_length=None) -> tuple[np.ndarray, np.ndarray]:
    """All normalized crops for one individual: (N, H, W, 1) + frames."""
    s = settings
    if median_midline_length is None:
        lengths = [p.midline_length for p in ind.posture
                   if not math.isnan(p.midline_length)]
        median_midline_length = float(np.median(lengths)) if lengths else None
    out, got = [], []
    for b in ind.basic:
        if frames is not None and b.frame not in frames:
            continue
        post = ind.posture_stuff(b.frame)
        midline = post.midline if post else None
        crop = normalized_crop(b.blob, tracker.background, s,
                               midline=midline,
                               median_midline_length=median_midline_length)
        out.append(crop)
        got.append(b.frame)
    if not out:
        size = s["individual_image_size"]
        return (np.zeros((0, int(size[1]), int(size[0]), 1), np.uint8),
                np.zeros(0, np.int64))
    return (np.stack(out)[..., None], np.asarray(got, np.int64))


# ---------------------------------------------------------------------------
# device path: batched affine sampling for crops already on the TPU
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("out_hw",))
def warp_crops_device(images: jax.Array, centers: jax.Array,
                      angles: jax.Array, scales: jax.Array,
                      out_hw: tuple = (80, 80)) -> jax.Array:
    """Batched rotate+scale+center resampling (bilinear).

    images: (B, H, W) float; centers: (B, 2) xy; angles: (B,) rad;
    scales: (B,). Returns (B, oh, ow). Static shapes; the gather-based
    bilinear sampling vectorizes on the VPU and fuses with the
    normalization that follows.
    """
    oh, ow = out_hw
    B, H, W = images.shape
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    # destination grid centered at output middle
    dx = xs - ow / 2.0
    dy = ys - oh / 2.0
    cos = jnp.cos(-angles)[:, None, None] / jnp.maximum(scales, 1e-6)[:, None, None]
    sin = jnp.sin(-angles)[:, None, None] / jnp.maximum(scales, 1e-6)[:, None, None]
    sx = centers[:, 0][:, None, None] + cos * dx - sin * dy
    sy = centers[:, 1][:, None, None] + sin * dx + cos * dy
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(img, yy, xx):
        yy = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        return img[yy, xx]

    g = jax.vmap(gather)
    v00 = g(images, y0, x0)
    v01 = g(images, y0, x0 + 1)
    v10 = g(images, y0 + 1, x0)
    v11 = g(images, y0 + 1, x0 + 1)
    inside = ((sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1))
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return jnp.where(inside, out, 0.0)
