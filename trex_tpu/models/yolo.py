"""YOLOv8-family detection models in flax (NHWC, bfloat16 compute).

Replaces the reference's embedded-ultralytics path (python/trex_yolo.py,
python/bbx_saved_model.py): same architecture family so ultralytics
`.pt` weights convert 1:1 (see yolo_convert.py):

  backbone: Conv stem -> C2f stages -> SPPF
  neck:     PAN-FPN over P3/P4/P5
  heads:    Detect (DFL reg_max=16 + cls), Segment (+32 proto masks),
            Pose (keypoints), OBB (+angle)

Decoding (dist2bbox over per-level anchors, DFL expectation, sigmoid
class scores) matches ultralytics' inference path so downstream SAHI
merge + blob conversion behave like the reference (YOLO.cpp:754-1190).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALES = {
    # depth, width, max_channels — ultralytics yolov8 scales
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(round(x / divisor) * divisor))


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNSiLU(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C2f(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBNSiLU(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                    name=f"m{i}")(parts[-1], train))
        return ConvBNSiLU(self.features, 1, dtype=self.dtype,
                          name="cv2")(jnp.concatenate(parts, -1), train)


class SPPF(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = ConvBNSiLU(c, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [x]
        for _ in range(3):
            pools.append(nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                     padding=((2, 2), (2, 2))))
        return ConvBNSiLU(self.features, 1, dtype=self.dtype,
                          name="cv2")(jnp.concatenate(pools, -1), train)


class Backbone(nn.Module):
    depth: float
    width: float
    max_channels: int
    dtype: Any = jnp.bfloat16

    def ch(self, c):
        return _make_divisible(min(c, self.max_channels) * self.width)

    def nd(self, n):
        return max(1, round(n * self.depth))

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = ConvBNSiLU(self.ch(64), 3, 2, dtype=d, name="stem")(x, train)
        x = ConvBNSiLU(self.ch(128), 3, 2, dtype=d, name="down1")(x, train)
        x = C2f(self.ch(128), self.nd(3), True, dtype=d, name="c2f1")(x, train)
        x = ConvBNSiLU(self.ch(256), 3, 2, dtype=d, name="down2")(x, train)
        p3 = C2f(self.ch(256), self.nd(6), True, dtype=d, name="c2f2")(x, train)
        x = ConvBNSiLU(self.ch(512), 3, 2, dtype=d, name="down3")(p3, train)
        p4 = C2f(self.ch(512), self.nd(6), True, dtype=d, name="c2f3")(x, train)
        x = ConvBNSiLU(self.ch(1024), 3, 2, dtype=d, name="down4")(p4, train)
        x = C2f(self.ch(1024), self.nd(3), True, dtype=d, name="c2f4")(x, train)
        p5 = SPPF(self.ch(1024), dtype=d, name="sppf")(x, train)
        return p3, p4, p5


class PANNeck(nn.Module):
    depth: float
    width: float
    max_channels: int
    dtype: Any = jnp.bfloat16

    def ch(self, c):
        return _make_divisible(min(c, self.max_channels) * self.width)

    def nd(self, n):
        return max(1, round(n * self.depth))

    @nn.compact
    def __call__(self, feats, train: bool = False):
        p3, p4, p5 = feats
        d = self.dtype

        def up(x):
            b, h, w, c = x.shape
            return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")

        x = jnp.concatenate([up(p5), p4], -1)
        n4 = C2f(self.ch(512), self.nd(3), False, dtype=d, name="up_c2f1")(x, train)
        x = jnp.concatenate([up(n4), p3], -1)
        n3 = C2f(self.ch(256), self.nd(3), False, dtype=d, name="up_c2f2")(x, train)
        x = ConvBNSiLU(self.ch(256), 3, 2, dtype=d, name="down_conv1")(n3, train)
        x = jnp.concatenate([x, n4], -1)
        n4b = C2f(self.ch(512), self.nd(3), False, dtype=d, name="down_c2f1")(x, train)
        x = ConvBNSiLU(self.ch(512), 3, 2, dtype=d, name="down_conv2")(n4b, train)
        x = jnp.concatenate([x, p5], -1)
        n5 = C2f(self.ch(1024), self.nd(3), False, dtype=d, name="down_c2f2")(x, train)
        return n3, n4b, n5


class DetectHead(nn.Module):
    """Per-level box-regression (DFL) + classification branches."""
    num_classes: int
    reg_max: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        box_out, cls_out = [], []
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        for i, f in enumerate(feats):
            b = ConvBNSiLU(c2, 3, dtype=self.dtype, name=f"box{i}_0")(f, train)
            b = ConvBNSiLU(c2, 3, dtype=self.dtype, name=f"box{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), dtype=jnp.float32,
                        name=f"box{i}_2")(b)
            c = ConvBNSiLU(c3, 3, dtype=self.dtype, name=f"cls{i}_0")(f, train)
            c = ConvBNSiLU(c3, 3, dtype=self.dtype, name=f"cls{i}_1")(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                        name=f"cls{i}_2")(c)
            box_out.append(b)
            cls_out.append(c)
        return box_out, cls_out


def make_anchors(shapes: Sequence[tuple], strides=(8, 16, 32),
                 offset: float = 0.5):
    """Anchor centers (N,2) + per-anchor stride (N,) for the given
    per-level (h, w) shapes."""
    pts, strs = [], []
    for (h, w), s in zip(shapes, strides):
        xs = (jnp.arange(w, dtype=jnp.float32) + offset)
        ys = (jnp.arange(h, dtype=jnp.float32) + offset)
        gx, gy = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        strs.append(jnp.full((h * w,), s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dfl_decode(box_logits: jax.Array, reg_max: int = 16) -> jax.Array:
    """Distribution-focal decoding: softmax expectation over reg_max bins.
    box_logits: (..., 4*reg_max) -> (..., 4) ltrb distances."""
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(*shape, 4, reg_max)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return (p * bins).sum(-1)


def dist2bbox(ltrb: jax.Array, anchors: jax.Array,
              strides: jax.Array) -> jax.Array:
    """ltrb distances (anchor units) -> xyxy boxes in input pixels."""
    x0 = (anchors[:, 0] - ltrb[..., 0]) * strides
    y0 = (anchors[:, 1] - ltrb[..., 1]) * strides
    x1 = (anchors[:, 0] + ltrb[..., 2]) * strides
    y1 = (anchors[:, 1] + ltrb[..., 3]) * strides
    return jnp.stack([x0, y0, x1, y1], -1)


class YOLOv8(nn.Module):
    """Full model; task in {detect, segment, pose, obb}."""
    num_classes: int = 80
    scale: str = "n"
    task: str = "detect"
    reg_max: int = 16
    num_keypoints: int = 17
    kpt_dims: int = 3
    num_masks: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, maxc = SCALES[self.scale]
        x = x.astype(self.dtype) / 255.0
        feats = Backbone(depth, width, maxc, dtype=self.dtype,
                         name="backbone")(x, train)
        feats = PANNeck(depth, width, maxc, dtype=self.dtype,
                        name="neck")(feats, train)
        box_out, cls_out = DetectHead(self.num_classes, self.reg_max,
                                      dtype=self.dtype,
                                      name="detect")(feats, train)
        out = {"boxes": box_out, "classes": cls_out,
               "shapes": tuple(f.shape[1:3] for f in feats)}
        # task heads use the ultralytics cv4 layout exactly —
        # Sequential(Conv(x, c4, 3), Conv(c4, c4, 3), Conv2d(c4, out, 1))
        # with c4 = max(ch[0]//4, out) shared across levels — so real
        # .pt checkpoints convert 1:1 (ultralytics nn/modules/head.py)
        ch0 = feats[0].shape[-1]

        def cv4(prefix, c4, n_out):
            outs = []
            for i, f in enumerate(feats):
                m = ConvBNSiLU(c4, 3, dtype=self.dtype,
                               name=f"{prefix}{i}_0")(f, train)
                m = ConvBNSiLU(c4, 3, dtype=self.dtype,
                               name=f"{prefix}{i}_1")(m, train)
                m = nn.Conv(n_out, (1, 1), dtype=jnp.float32,
                            name=f"{prefix}{i}_2")(m)
                outs.append(m)
            return outs

        if self.task == "segment":
            out["mask_coeffs"] = cv4(
                "mask", max(ch0 // 4, self.num_masks), self.num_masks)
            # Proto(ch[0], npr, nm): npr = 256 scaled by the model width
            c_ = max(8, int(round(256 * width / 8)) * 8)
            p = ConvBNSiLU(c_, 3, dtype=self.dtype,
                           name="proto_cv1")(feats[0], train)
            p = nn.ConvTranspose(c_, (2, 2), strides=(2, 2),
                                 dtype=jnp.float32, name="proto_up")(p)
            p = ConvBNSiLU(c_, 3, dtype=self.dtype,
                           name="proto_cv2")(p, train)
            p = ConvBNSiLU(self.num_masks, 1, dtype=self.dtype,
                           name="proto_cv3")(p, train)
            out["proto"] = p
        elif self.task == "pose":
            nk = self.num_keypoints * self.kpt_dims
            out["keypoints"] = cv4("kpt", max(ch0 // 4, nk), nk)
        elif self.task == "obb":
            out["angles"] = cv4("ang", max(ch0 // 4, 1), 1)
        return out


def decode_predictions(out: dict, num_classes: int, reg_max: int = 16,
                       strides=(8, 16, 32)) -> dict:
    """Flatten per-level outputs into (B, N, ...) decoded predictions.
    Confidence filtering happens downstream (YOLODetector
    ._postprocess), not here."""
    shapes = out["shapes"]
    anchors, strd = make_anchors(shapes, strides)
    B = out["boxes"][0].shape[0]
    box_flat = jnp.concatenate(
        [b.reshape(B, -1, 4 * reg_max) for b in out["boxes"]], 1)
    cls_flat = jnp.concatenate(
        [c.reshape(B, -1, num_classes) for c in out["classes"]], 1)
    ltrb = dfl_decode(box_flat, reg_max)
    boxes = dist2bbox(ltrb, anchors, strd)
    scores = jax.nn.sigmoid(cls_flat)
    conf = scores.max(-1)
    clid = scores.argmax(-1)
    decoded = {"boxes": boxes, "conf": conf, "clid": clid,
               "scores": scores}
    if "keypoints" in out:
        kp_flat = jnp.concatenate(
            [k.reshape(B, k.shape[1] * k.shape[2], -1)
             for k in out["keypoints"]], 1)
        nk = kp_flat.shape[-1] // 3
        kp = kp_flat.reshape(B, -1, nk, 3)
        kx = (kp[..., 0] * 2.0 + (anchors[None, :, None, 0] - 0.5)) \
            * strd[None, :, None]
        ky = (kp[..., 1] * 2.0 + (anchors[None, :, None, 1] - 0.5)) \
            * strd[None, :, None]
        kconf = jax.nn.sigmoid(kp[..., 2])
        decoded["keypoints"] = jnp.stack([kx, ky, kconf], -1)
    if "mask_coeffs" in out:
        decoded["mask_coeffs"] = jnp.concatenate(
            [m.reshape(B, -1, m.shape[-1]) for m in out["mask_coeffs"]], 1)
        decoded["proto"] = out["proto"]
    if "angles" in out:
        # OBB decode (ultralytics dist2rbox): the ltrb distances are in
        # the box's own rotated frame — the center offset rotates by
        # the predicted angle before adding the anchor
        ang = jnp.concatenate(
            [a.reshape(B, -1) for a in out["angles"]], 1)
        ang = (jax.nn.sigmoid(ang) - 0.25) * jnp.pi
        lt, rb = ltrb[..., :2], ltrb[..., 2:]
        off = (rb - lt) / 2.0
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        cx = (off[..., 0] * cos - off[..., 1] * sin
              + anchors[None, :, 0]) * strd[None, :]
        cy = (off[..., 0] * sin + off[..., 1] * cos
              + anchors[None, :, 1]) * strd[None, :]
        bw = (lt[..., 0] + rb[..., 0]) * strd[None, :]
        bh = (lt[..., 1] + rb[..., 1]) * strd[None, :]
        decoded["obb"] = jnp.stack([cx, cy, bw, bh, ang], -1)
        # axis-aligned hull of the rotated rect feeds the shared
        # conf/NMS machinery downstream
        ex = (jnp.abs(bw / 2 * cos) + jnp.abs(bh / 2 * sin))
        ey = (jnp.abs(bw / 2 * sin) + jnp.abs(bh / 2 * cos))
        decoded["boxes"] = jnp.stack(
            [cx - ex, cy - ey, cx + ex, cy + ey], -1)
    return decoded
