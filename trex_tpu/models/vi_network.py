"""Visual-identification CNN zoo (flax/linen, NHWC, TPU-native).

Replaces the reference's embedded torch/keras model zoo keyed by
`visual_identification_version` (reference
python/visual_identification_network_torch.py: V118_3 :184-250,
V119 :106-180, V200 :30-104; keras table
visual_identification_network.py:205-482). Inputs are NHWC uint8 crops
(individual_image_size, default 80x80, 1 channel); the input Lambda
normalizes x/127.5 - 1. Compute in bfloat16 on the MXU, params float32.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ConvBlock(nn.Module):
    features: int
    kernel: int
    pool: int
    dropout: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=jnp.float32)(x)
        x = nn.relu(x)
        if self.pool > 1:
            x = nn.max_pool(x, (self.pool, self.pool),
                            strides=(self.pool, self.pool))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class V118_3(nn.Module):
    """Compact default VI network (visual_identification_version v118_3)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = ConvBlock(16, 5, 2, 0.05, self.dtype)(x, train)
        x = ConvBlock(64, 5, 2, 0.05, self.dtype)(x, train)
        x = ConvBlock(128, 5, 2, 0.05, self.dtype)(x, train)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(100, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.05, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class V110(nn.Module):
    """Shallow legacy CNN (v110): conv -> pool -> BN -> relu -> dropout
    stages (the pool-before-BN ordering is the version's defining
    difference, visual_identification_network_torch.py:262-325)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        for feat in (16, 64, 100):
            x = nn.Conv(feat, (5, 5), padding="SAME", dtype=self.dtype)(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = nn.Dropout(0.25, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(100, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class V100(nn.Module):
    """The original layout (v100): conv -> relu -> pool -> dropout, no
    normalization (visual_identification_network_torch.py:328-385)."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        for feat in (16, 64, 100):
            x = nn.Conv(feat, (5, 5), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dropout(0.25, deterministic=not train)(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(100, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class V119(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        for feat in (256, 128, 32, 128):
            x = ConvBlock(feat, 5, 2, 0.05, self.dtype)(x, train)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(1024, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class V200(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = ConvBlock(64, 3, 1, 0.0, self.dtype)(x, train)
        x = ConvBlock(128, 3, 3, 0.05, self.dtype)(x, train)
        x = ConvBlock(256, 3, 1, 0.0, self.dtype)(x, train)
        x = ConvBlock(512, 3, 3, 0.25, self.dtype)(x, train)
        x = ConvBlock(512, 3, 3, 0.05, self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(1024, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.05, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class ViT(nn.Module):
    """Small vision transformer variant
    (visual_identification_network.py:118-203)."""
    num_classes: int
    patch: int = 10
    dim: int = 128
    depth: int = 4
    heads: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        b, h, w, c = x.shape
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype)(x)
        x = x.reshape((b, -1, self.dim))
        n = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.dim))
        x = x + pos.astype(self.dtype)
        for _ in range(self.depth):
            y = nn.LayerNorm(dtype=jnp.float32)(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype)(y, y)
            x = x + y
            y = nn.LayerNorm(dtype=jnp.float32)(x)
            y = nn.Dense(self.dim * 4, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim, dtype=self.dtype)(y)
            y = nn.Dropout(0.1, deterministic=not train)(y)
            x = x + y
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


class SmallMLP(nn.Module):
    """Categorization MLP (reference trex_learn_category.py:18-153)."""
    num_classes: int
    hidden: int = 100
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.25, deterministic=not train)(x)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class VGG(nn.Module):
    """VGG16/19 backbone + the reference zoo's classification head
    (visual_identification_network.py:205-410 uses keras-applications
    backbones with include_top=False + GAP + dense head, trained from
    scratch on identity crops)."""
    num_classes: int
    blocks: tuple = (2, 2, 3, 3, 3)  # vgg16; vgg19 = (2,2,4,4,4)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        feats = (64, 128, 256, 512, 512)
        for bi, (n, f) in enumerate(zip(self.blocks, feats)):
            for i in range(n):
                x = nn.Conv(f, (3, 3), padding="SAME",
                            dtype=self.dtype)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))  # GAP head
        x = nn.Dense(1024, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.05, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


class _BottleneckV2(nn.Module):
    """ResNet v2 pre-activation bottleneck."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=jnp.float32)(x)
        pre = nn.relu(pre)
        if self.stride > 1 or x.shape[-1] != self.features * 4:
            shortcut = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype)(pre)
        else:
            shortcut = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(pre)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), dtype=self.dtype)(y)
        return shortcut + y


class ResNet50V2(nn.Module):
    """ResNet50 v2 (pre-activation) + GAP head, the reference zoo's
    resnet50v2 option."""
    num_classes: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype) / 127.5 - 1.0
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, (f, n, s) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for i in range(n):
                x = _BottleneckV2(f, s if i == 0 else 1,
                                  dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return x


def _vgg19(num_classes, dtype=jnp.bfloat16):
    return VGG(num_classes=num_classes, blocks=(2, 2, 4, 4, 4),
               dtype=dtype)


def _mnv3_large(num_classes, dtype=jnp.bfloat16):
    from .backbones import MobileNetV3

    return MobileNetV3(num_classes=num_classes, small=False, dtype=dtype)


def _lazy(name):
    def make(num_classes, dtype=jnp.bfloat16):
        from . import backbones

        return getattr(backbones, name)(num_classes=num_classes,
                                        dtype=dtype)
    return make


# Keys are normalized (lowercase, separators stripped), so both the
# keras-era names ("efficientnetb0") and the current enum's names
# ("efficient_net_b0" / "efficientnet_b0",
# default_config.cpp:144-161) resolve. "current" follows the
# reference's alias (visual_identification_network.py:548 -> v119).
VERSIONS: dict[str, Callable[..., nn.Module]] = {
    "v1183": V118_3,
    "v118": V118_3,
    "v119": V119,
    "v200": V200,
    "v110": V110,
    "v100": V100,
    "current": V119,
    "vitb16": ViT,
    "vgg16": VGG,
    "vgg19": _vgg19,
    "resnet50v2": ResNet50V2,
    "resnet18": _lazy("ResNet18"),
    "efficientnetb0": _lazy("EfficientNetB0"),
    "mobilenetv3small": _lazy("MobileNetV3"),
    "mobilenetv3large": _mnv3_large,
    "convnextbase": _lazy("ConvNeXtBase"),
    "inceptionv3": _lazy("InceptionV3"),
    "xception": _lazy("Xception"),
    "nasnetmobile": _lazy("NASNetMobile"),
}

# every reference zoo entry now has a native implementation
UNIMPLEMENTED_VERSIONS = ()


def _normalize(version: str) -> str:
    return str(version).lower().replace("_", "").replace("-", "")


def build(version: str, num_classes: int,
          dtype: Dtype = None) -> nn.Module:
    key = _normalize(version)
    if key in UNIMPLEMENTED_VERSIONS:
        raise NotImplementedError(
            f"visual_identification_version {version!r} is in the "
            f"reference zoo but has no native implementation here yet; "
            f"implemented: {sorted(VERSIONS)}")
    if key not in VERSIONS:
        raise ValueError(
            f"unknown visual_identification_version {version!r}; "
            f"available: {sorted(VERSIONS)}")
    kwargs = {"num_classes": num_classes}
    if dtype is not None:
        kwargs["dtype"] = dtype
    return VERSIONS[key](**kwargs)
