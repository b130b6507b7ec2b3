"""Official-zoo backbones for visual identification (flax, NHWC, TPU).

The reference's `ModelFetcher` serves torchvision backbones with the
first conv re-fit to the crop's channel count and a fresh classifier
head (visual_identification_network_torch.py:389-560: convnext_base,
vgg_16, vgg_19, mobilenet_v3_small, mobilenet_v3_large, resnet_50_v2,
efficientnet_b0, inception_v3, resnet_18; the keras-era table at
visual_identification_network.py:205-482 additionally had xception).
These are native flax re-implementations of the same architectures —
NHWC, bfloat16 matmul/conv compute with float32 norm statistics, the
zoo's x/127.5-1 input Lambda, and a GAP + Dense(num_classes) head
trained from scratch (identity crops are 80x80 grayscale; ImageNet
weights do not transfer through a re-fit 1-channel stem anyway).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class ConvBN(nn.Module):
    """conv -> BN -> activation, the building block of every classical
    backbone here."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    padding: Any = "SAME"
    act: Any = nn.relu
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.padding, feature_group_count=self.groups,
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcite(nn.Module):
    """Squeeze-and-excitation over NHWC channels."""
    reduce: int
    gate: Any = nn.sigmoid
    act: Any = nn.relu
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.Dense(self.reduce, dtype=self.dtype)(s)
        s = self.act(s)
        s = nn.Dense(x.shape[-1], dtype=self.dtype)(s)
        s = self.gate(s)
        return x * s[:, None, None, :]


# ---------------------------------------------------------------- ResNet18
class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, 1, act=None, dtype=self.dtype)(y, train)
        if self.stride > 1 or x.shape[-1] != self.features:
            x = ConvBN(self.features, 1, self.stride, act=None,
                       dtype=self.dtype)(x, train)
        return nn.relu(x + y)


class ResNet18(nn.Module):
    """resnet_18 (torchvision models.resnet18, basic blocks, v1)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = ConvBN(64, 7, 2, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for f, n, s in ((64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)):
            for i in range(n):
                x = _BasicBlock(f, s if i == 0 else 1,
                                dtype=self.dtype)(x, train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ----------------------------------------------------------- EfficientNetB0
class _MBConv(nn.Module):
    expand: int
    features: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = x
        mid = inp * self.expand
        if self.expand != 1:
            y = ConvBN(mid, 1, act=nn.silu, dtype=self.dtype)(y, train)
        y = ConvBN(mid, self.kernel, self.stride, groups=mid,
                   act=nn.silu, dtype=self.dtype)(y, train)
        y = SqueezeExcite(max(1, inp // 4), act=nn.silu,
                          dtype=self.dtype)(y)
        y = ConvBN(self.features, 1, act=None, dtype=self.dtype)(y, train)
        if self.stride == 1 and inp == self.features:
            y = x + y
        return y


class EfficientNetB0(nn.Module):
    """efficientnet_b0 (MBConv stages with SE, SiLU)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16
    # (expand, out, kernel, stride, repeats)
    stages: Sequence = ((1, 16, 3, 1, 1), (6, 24, 3, 2, 2),
                        (6, 40, 5, 2, 2), (6, 80, 3, 2, 3),
                        (6, 112, 5, 1, 3), (6, 192, 5, 2, 4),
                        (6, 320, 3, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = ConvBN(32, 3, 2, act=nn.silu, dtype=self.dtype)(x, train)
        for expand, out, k, s, r in self.stages:
            for i in range(r):
                x = _MBConv(expand, out, k, s if i == 0 else 1,
                            dtype=self.dtype)(x, train)
        x = ConvBN(1280, 1, act=nn.silu, dtype=self.dtype)(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ------------------------------------------------------------- MobileNetV3
class _MNV3Block(nn.Module):
    kernel: int
    exp: int
    features: int
    se: bool
    hs: bool  # hardswish (else relu)
    stride: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = hard_swish if self.hs else nn.relu
        inp = x.shape[-1]
        y = x
        if self.exp != inp:
            y = ConvBN(self.exp, 1, act=act, dtype=self.dtype)(y, train)
        y = ConvBN(self.exp, self.kernel, self.stride, groups=self.exp,
                   act=act, dtype=self.dtype)(y, train)
        if self.se:
            y = SqueezeExcite(_make_divisible(self.exp / 4),
                              gate=hard_sigmoid, dtype=self.dtype)(y)
        y = ConvBN(self.features, 1, act=None, dtype=self.dtype)(y, train)
        if self.stride == 1 and inp == self.features:
            y = x + y
        return y


_MNV3_SMALL = (  # (kernel, exp, out, SE, HS, stride)
    (3, 16, 16, True, False, 2), (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1), (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1), (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1), (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2), (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1))

_MNV3_LARGE = (
    (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1))


class MobileNetV3(nn.Module):
    """mobilenet_v3_small / mobilenet_v3_large."""
    num_classes: int
    small: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = ConvBN(16, 3, 2, act=hard_swish, dtype=self.dtype)(x, train)
        cfg = _MNV3_SMALL if self.small else _MNV3_LARGE
        for k, exp, out, se, hs, s in cfg:
            x = _MNV3Block(k, exp, out, se, hs, s,
                           dtype=self.dtype)(x, train)
        last = 576 if self.small else 960
        head = 1024 if self.small else 1280
        x = ConvBN(last, 1, act=hard_swish, dtype=self.dtype)(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(head, dtype=self.dtype)(x)
        x = hard_swish(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ------------------------------------------------------------ ConvNeXtBase
class _ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype)(x)
        y = nn.LayerNorm(dtype=jnp.float32)(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        gamma = self.param("layer_scale", nn.initializers.constant(1e-6),
                           (self.dim,))
        return x + y * gamma.astype(y.dtype)


class ConvNeXtBase(nn.Module):
    """convnext_base: patchify stem, depthwise 7x7 blocks, LayerNorm,
    layer-scale residuals; depths (3,3,27,3), dims (128,256,512,1024)."""
    num_classes: int
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                    dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(dtype=jnp.float32)(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2),
                            dtype=self.dtype)(x)
            for _ in range(depth):
                x = _ConvNeXtBlock(dim, dtype=self.dtype)(x)
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ------------------------------------------------------------- InceptionV3
class _InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = ConvBN(64, 1, dtype=d)(x, train)
        b2 = ConvBN(48, 1, dtype=d)(x, train)
        b2 = ConvBN(64, 5, dtype=d)(b2, train)
        b3 = ConvBN(64, 1, dtype=d)(x, train)
        b3 = ConvBN(96, 3, dtype=d)(b3, train)
        b3 = ConvBN(96, 3, dtype=d)(b3, train)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(self.pool_features, 1, dtype=d)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _InceptionB(nn.Module):  # grid reduction 35 -> 17
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = ConvBN(384, 3, 2, padding="VALID", dtype=d)(x, train)
        b2 = ConvBN(64, 1, dtype=d)(x, train)
        b2 = ConvBN(96, 3, dtype=d)(b2, train)
        b2 = ConvBN(96, 3, 2, padding="VALID", dtype=d)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class _Conv7x1(nn.Module):
    features: int
    flip: bool = False  # (1,7) vs (7,1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (1, 7) if self.flip else (7, 1)
        x = nn.Conv(self.features, k, padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(x)
        return nn.relu(x)


class _InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = ConvBN(192, 1, dtype=d)(x, train)
        b2 = ConvBN(self.c7, 1, dtype=d)(x, train)
        b2 = _Conv7x1(self.c7, flip=True, dtype=d)(b2, train)
        b2 = _Conv7x1(192, dtype=d)(b2, train)
        b3 = ConvBN(self.c7, 1, dtype=d)(x, train)
        b3 = _Conv7x1(self.c7, dtype=d)(b3, train)
        b3 = _Conv7x1(self.c7, flip=True, dtype=d)(b3, train)
        b3 = _Conv7x1(self.c7, dtype=d)(b3, train)
        b3 = _Conv7x1(192, flip=True, dtype=d)(b3, train)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(192, 1, dtype=d)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class _InceptionD(nn.Module):  # grid reduction 17 -> 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = ConvBN(192, 1, dtype=d)(x, train)
        b1 = ConvBN(320, 3, 2, padding="VALID", dtype=d)(b1, train)
        b2 = ConvBN(192, 1, dtype=d)(x, train)
        b2 = _Conv7x1(192, flip=True, dtype=d)(b2, train)
        b2 = _Conv7x1(192, dtype=d)(b2, train)
        b2 = ConvBN(192, 3, 2, padding="VALID", dtype=d)(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class _InceptionE(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = ConvBN(320, 1, dtype=d)(x, train)
        b2 = ConvBN(384, 1, dtype=d)(x, train)
        b2a = nn.Conv(384, (1, 3), padding="SAME", use_bias=False,
                      dtype=d)(b2)
        b2a = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(b2a)
        b2b = nn.Conv(384, (3, 1), padding="SAME", use_bias=False,
                      dtype=d)(b2)
        b2b = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(b2b)
        b2 = nn.relu(jnp.concatenate([b2a, b2b], axis=-1))
        b3 = ConvBN(448, 1, dtype=d)(x, train)
        b3 = ConvBN(384, 3, dtype=d)(b3, train)
        b3a = nn.Conv(384, (1, 3), padding="SAME", use_bias=False,
                      dtype=d)(b3)
        b3a = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(b3a)
        b3b = nn.Conv(384, (3, 1), padding="SAME", use_bias=False,
                      dtype=d)(b3)
        b3b = nn.BatchNorm(use_running_average=not train,
                           dtype=jnp.float32)(b3b)
        b3 = nn.relu(jnp.concatenate([b3a, b3b], axis=-1))
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(192, 1, dtype=d)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    """inception_v3 (torchvision structure; SAME-padded stem so the
    80x80 identity crops keep a workable grid — torchvision's VALID
    stem assumes 299x299)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d) / 127.5 - 1.0
        x = ConvBN(32, 3, 2, dtype=d)(x, train)
        x = ConvBN(32, 3, dtype=d)(x, train)
        x = ConvBN(64, 3, dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        x = ConvBN(80, 1, dtype=d)(x, train)
        x = ConvBN(192, 3, dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        x = _InceptionA(32, dtype=d)(x, train)
        x = _InceptionA(64, dtype=d)(x, train)
        x = _InceptionA(64, dtype=d)(x, train)
        x = _InceptionB(dtype=d)(x, train)
        for c7 in (128, 160, 160, 192):
            x = _InceptionC(c7, dtype=d)(x, train)
        x = _InceptionD(dtype=d)(x, train)
        x = _InceptionE(dtype=d)(x, train)
        x = _InceptionE(dtype=d)(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ---------------------------------------------------------------- Xception
class _SepConvBN(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         dtype=jnp.float32)(x)
        return x


class _XceptionBlock(nn.Module):
    features: int
    relu_first: bool = True
    pool: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.pool or x.shape[-1] != self.features:
            shortcut = nn.Conv(self.features, (1, 1),
                               strides=(2, 2) if self.pool else (1, 1),
                               use_bias=False, dtype=self.dtype)(x)
            shortcut = nn.BatchNorm(use_running_average=not train,
                                    dtype=jnp.float32)(shortcut)
        y = x
        for i in range(3 if not self.pool else 2):
            if i > 0 or self.relu_first:
                y = nn.relu(y)
            y = _SepConvBN(self.features, dtype=self.dtype)(y, train)
        if self.pool:
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        return y + shortcut


class Xception(nn.Module):
    """xception (keras-era zoo entry): entry flow, 8 middle-flow
    blocks, exit flow; separable convs throughout."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d) / 127.5 - 1.0
        x = ConvBN(32, 3, 2, dtype=d)(x, train)
        x = ConvBN(64, 3, dtype=d)(x, train)
        x = _XceptionBlock(128, relu_first=False, dtype=d)(x, train)
        x = _XceptionBlock(256, dtype=d)(x, train)
        x = _XceptionBlock(728, dtype=d)(x, train)
        for _ in range(8):
            x = _XceptionBlock(728, pool=False, dtype=d)(x, train)
        # exit flow
        shortcut = nn.Conv(1024, (1, 1), strides=(2, 2), use_bias=False,
                           dtype=d)(x)
        shortcut = nn.BatchNorm(use_running_average=not train,
                                dtype=jnp.float32)(shortcut)
        y = nn.relu(x)
        y = _SepConvBN(728, dtype=d)(y, train)
        y = nn.relu(y)
        y = _SepConvBN(1024, dtype=d)(y, train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        x = y + shortcut
        x = nn.relu(_SepConvBN(1536, dtype=d)(x, train))
        x = nn.relu(_SepConvBN(2048, dtype=d)(x, train))
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


# ------------------------------------------------------------ NASNetMobile
def _correct_pad(h: int, w: int, k: int):
    """keras imagenet_utils.correct_pad for stride-2 VALID convs."""
    adj = (1 - h % 2, 1 - w % 2)
    c = k // 2
    return ((c - adj[0], c), (c - adj[1], c))


class _NASSepConv(nn.Module):
    """NASNet separable-conv block: two rounds of
    relu -> depthwise+pointwise -> BN (keras _separable_conv_block)."""
    filters: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(x)
        if self.stride == 2:
            ph, pw = _correct_pad(x.shape[1], x.shape[2], self.kernel)
            x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
            pad = "VALID"
        else:
            pad = "SAME"
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel), padding="SAME",
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=jnp.float32)(x)
        return x


class _NASAdjust(nn.Module):
    """keras _adjust_block: match the previous path p to the current
    input's spatial size / channel count (factorized reduction)."""
    filters: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, p, ip, train: bool = False):
        if p.shape[1] != ip.shape[1]:
            p = nn.relu(p)
            p1 = p[:, ::2, ::2, :]
            p1 = nn.Conv(self.filters // 2, (1, 1), use_bias=False,
                         dtype=self.dtype)(p1)
            # pad bottom/right, crop top/left: one-pixel diagonal shift
            p2 = jnp.pad(p, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
            p2 = p2[:, ::2, ::2, :]
            p2 = nn.Conv(self.filters // 2, (1, 1), use_bias=False,
                         dtype=self.dtype)(p2)
            p = jnp.concatenate([p1, p2], axis=-1)
            p = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=jnp.float32)(p)
        elif p.shape[-1] != self.filters:
            p = nn.relu(p)
            p = nn.Conv(self.filters, (1, 1), use_bias=False,
                        dtype=self.dtype)(p)
            p = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=jnp.float32)(p)
        return p


class _NASNormalCell(nn.Module):
    filters: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, p, train: bool = False):
        d = self.dtype
        ip = x
        # keras _adjust_block: a None previous path passes through as
        # ip itself, unprojected
        p = ip if p is None else \
            _NASAdjust(self.filters, dtype=d)(p, ip, train)
        h = nn.relu(ip)
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=d)(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=jnp.float32)(h)
        x1 = _NASSepConv(self.filters, 5, dtype=d)(h, train) \
            + _NASSepConv(self.filters, 3, dtype=d)(p, train)
        x2 = _NASSepConv(self.filters, 5, dtype=d)(p, train) \
            + _NASSepConv(self.filters, 3, dtype=d)(p, train)
        x3 = nn.avg_pool(h, (3, 3), (1, 1), "SAME") + p
        x4 = nn.avg_pool(p, (3, 3), (1, 1), "SAME") \
            + nn.avg_pool(p, (3, 3), (1, 1), "SAME")
        x5 = _NASSepConv(self.filters, 3, dtype=d)(h, train) + h
        return jnp.concatenate([p, x1, x2, x3, x4, x5], axis=-1), ip


class _NASReductionCell(nn.Module):
    filters: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, p, train: bool = False):
        d = self.dtype
        ip = x
        p = ip if p is None else \
            _NASAdjust(self.filters, dtype=d)(p, ip, train)
        h = nn.relu(ip)
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=d)(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=jnp.float32)(h)
        ph, pw = _correct_pad(h.shape[1], h.shape[2], 3)
        h3 = jnp.pad(h, ((0, 0), ph, pw, (0, 0)))
        x1 = _NASSepConv(self.filters, 5, 2, dtype=d)(h, train) \
            + _NASSepConv(self.filters, 7, 2, dtype=d)(p, train)
        x2 = nn.max_pool(h3, (3, 3), (2, 2), "VALID") \
            + _NASSepConv(self.filters, 7, 2, dtype=d)(p, train)
        x3 = nn.avg_pool(h3, (3, 3), (2, 2), "VALID") \
            + _NASSepConv(self.filters, 5, 2, dtype=d)(p, train)
        x4 = x2 + nn.avg_pool(x1, (3, 3), (1, 1), "SAME")
        x5 = _NASSepConv(self.filters, 3, dtype=d)(x1, train) \
            + nn.max_pool(h3, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([x2, x3, x4, x5], axis=-1), ip


class NASNetMobile(nn.Module):
    """nasnetmobile (keras-era zoo entry): NASNet-A (4 @ 1056),
    penultimate 1056 -> filters 44, stem 32, filter multiplier 2
    (keras/src/applications/nasnet.py structure; trained from scratch
    with the zoo's GAP + Dense head)."""
    num_classes: int
    num_blocks: int = 4
    filters: int = 44  # penultimate_filters // 24
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        f = self.filters
        x = x.astype(d) / 127.5 - 1.0
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=d)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=jnp.float32)(x)
        p = None  # keras: first cell's previous path is ip itself
        x, p = _NASReductionCell(f // 4, dtype=d)(x, p, train)
        x, p = _NASReductionCell(f // 2, dtype=d)(x, p, train)
        for _ in range(self.num_blocks):
            x, p = _NASNormalCell(f, dtype=d)(x, p, train)
        x, p = _NASReductionCell(f * 2, dtype=d)(x, p, train)
        for _ in range(self.num_blocks):
            x, p = _NASNormalCell(f * 2, dtype=d)(x, p, train)
        x, p = _NASReductionCell(f * 4, dtype=d)(x, p, train)
        for _ in range(self.num_blocks):
            x, p = _NASNormalCell(f * 4, dtype=d)(x, p, train)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)
