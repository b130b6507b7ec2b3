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
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
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
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
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
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
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


VERSIONS: dict[str, Callable[..., nn.Module]] = {
    "v118_3": V118_3,
    "v118": V118_3,
    "v119": V119,
    "v200": V200,
    "vit_b_16": ViT,
    "convnext_base": V200,  # keras-applications backbones map to the
    "efficientnetb0": V200,  # strongest local CNN until ported weights
    "resnet50v2": V200,      # land (visual_identification_network.py:205+)
    "mobilenetv3small": V118_3,
    "vgg16": V200,
    "vgg19": V200,
    "inceptionv3": V200,
    "xception": V200,
}


def build(version: str, num_classes: int) -> nn.Module:
    key = str(version).lower()
    if key not in VERSIONS:
        raise ValueError(
            f"unknown visual_identification_version {version!r}; "
            f"available: {sorted(VERSIONS)}")
    return VERSIONS[key](num_classes=num_classes)
