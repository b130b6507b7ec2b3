"""Promptable segmentation model (SAM architecture) in flax.

Backs the sam3 detection backend (reference python/SAM3.{h,cpp} +
trex_sam3_interface.py, which drive a promptable segmentation model
through box/point prompts): a ViT image encoder with windowed attention
and decomposed relative position embeddings, a prompt encoder for
points/boxes, and a lightweight two-way-transformer mask decoder with
an IoU head — the segment-anything (ViT-B/L/H) architecture, so
official checkpoints convert directly (convert_sam_checkpoint maps the
`image_encoder.* / prompt_encoder.* / mask_decoder.*` state dict).

All attention/matmul compute runs in the configured dtype (bf16 on
TPU) with f32 accumulations where it matters (softmax, layer norm).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class MLPBlock(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="lin2")(x)


def _rel_pos(q_size, k_size, rel_pos):
    """Interpolated relative position table lookup (SAM get_rel_pos)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]),
                               "linear")
    else:
        rel = rel_pos
    qs = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    ks = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (qs - ks) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel[idx.astype(jnp.int32)]


class Attention(nn.Module):
    """Multi-head attention with decomposed relative positions."""
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple = (14, 14)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # 3, B, nh, HW, hd
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 1, 3, 2)
        if self.use_rel_pos:
            rh = self.param("rel_pos_h", nn.initializers.zeros,
                            (2 * self.input_size[0] - 1, hd), jnp.float32)
            rw = self.param("rel_pos_w", nn.initializers.zeros,
                            (2 * self.input_size[1] - 1, hd), jnp.float32)
            Rh = _rel_pos(H, H, rh).astype(q.dtype)   # (H, H, hd)
            Rw = _rel_pos(W, W, rw).astype(q.dtype)   # (W, W, hd)
            rq = q.reshape(B, self.num_heads, H, W, hd)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


def _window_partition(x, ws):
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return win, (Hp, Wp)


def _window_unpartition(win, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0
    input_size: tuple = (64, 64)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        hw = (y.shape[1], y.shape[2])
        if self.window_size > 0:
            y, pad_hw = _window_partition(y, self.window_size)
            isize = (self.window_size, self.window_size)
        else:
            isize = self.input_size
        y = Attention(self.dim, self.num_heads, input_size=isize,
                      dtype=self.dtype, name="attn")(y)
        if self.window_size > 0:
            y = _window_unpartition(y, self.window_size, pad_hw, hw)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        return x + MLPBlock(self.dim, self.dim * 4, dtype=self.dtype,
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_idx: Sequence[int] = (2, 5, 8, 11)  # ViT-B
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) normalized
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch),
                    dtype=self.dtype, name="patch_embed")(x)
        side = self.img_size // self.patch
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, side, side, self.dim), jnp.float32)
        if x.shape[1] != side:
            pos = jax.image.resize(
                pos, (1, x.shape[1], x.shape[2], self.dim), "linear")
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            ws = 0 if i in self.global_idx else self.window_size
            x = ViTBlock(self.dim, self.num_heads, window_size=ws,
                         input_size=(x.shape[1], x.shape[2]),
                         dtype=self.dtype, name=f"block{i}")(x)
        # neck: 1x1 conv + LN + 3x3 conv + LN
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                    dtype=self.dtype, name="neck0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="neck1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="neck2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="neck3")(x)
        return x


class PromptEncoder(nn.Module):
    """Point/box prompts -> sparse embeddings; dense no-mask embed."""
    embed_dim: int = 256
    image_size: int = 1024
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0),
            (2, self.embed_dim // 2), jnp.float32)
        # 0: neg point, 1: pos point, 2: box tl, 3: box br
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim), jnp.float32)
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim), jnp.float32)

    def _pe(self, coords):
        """Random-fourier positional encoding of [0,1] coords. The
        tiny (.., 2) x (2, D) contraction runs at HIGHEST precision:
        the default matmul precision truncates the sin/cos arguments
        to ~1e-2, visibly warping the positional code."""
        c = coords * 2 - 1
        c = jnp.dot(c, self.pe_gaussian.astype(coords.dtype),
                    precision=jax.lax.Precision.HIGHEST)
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def encode_points(self, points, labels):
        """points (B, N, 2) in pixels, labels (B, N): 1 pos, 0 neg,
        -1 pad, 2/3 box corners."""
        coords = (points + 0.5) / self.image_size
        pe = self._pe(coords)
        emb = jnp.where(
            (labels == -1)[..., None],
            self.not_a_point[0] + jnp.zeros_like(pe),
            pe + jnp.take(self.point_embeddings,
                          jnp.clip(labels, 0, 3), axis=0))
        return emb

    def dense_pe(self, h, w):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self._pe(jnp.stack([gx, gy], -1))

    def __call__(self, points, labels, h, w):
        sparse = self.encode_points(points, labels)
        dense = self.no_mask_embed.reshape(1, 1, 1, -1)
        dense = jnp.broadcast_to(dense,
                                 (points.shape[0], h, w, self.embed_dim))
        return sparse, dense


class TextEncoder(nn.Module):
    """Toy concept/text encoder for SAM3-style text prompts
    (trex_sam3_interface.py:26-60, SAM3PromptState.cpp): free text ->
    `n_tokens` sparse prompt tokens for the mask decoder, trainable
    end-to-end. No pretrained text tower is reachable in this
    environment (zero egress), so this is a byte-level embedding +
    positional code + MLP — the INTERFACE matches the reference's
    concept prompts and a real text tower drops in by swapping this
    module."""
    embed_dim: int = 256
    vocab: int = 256
    n_tokens: int = 2
    max_len: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids):
        """token_ids (B, L) int32 byte values, 0 = pad ->
        (B, n_tokens, embed_dim) sparse prompt tokens."""
        emb = nn.Embed(self.vocab, self.embed_dim,
                       dtype=jnp.float32)(token_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.embed_dim), jnp.float32)
        emb = emb + pos[None, : emb.shape[1]]
        mask = (token_ids > 0).astype(jnp.float32)[..., None]
        pooled = (emb * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
        x = nn.Dense(self.embed_dim * 2, dtype=jnp.float32)(pooled)
        x = nn.gelu(x)
        x = nn.Dense(self.embed_dim * self.n_tokens,
                     dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], self.n_tokens, self.embed_dim)


def tokenize_text(text: str, max_len: int = 32) -> np.ndarray:
    """Byte-level tokenization for TextEncoder (0 = pad)."""
    b = text.strip().lower().encode("utf-8")[:max_len]
    out = np.zeros(max_len, np.int32)
    out[: len(b)] = np.frombuffer(b, np.uint8)
    return out


class TwoWayAttention(nn.Module):
    dim: int
    num_heads: int
    downsample: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.num_heads
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                             hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = (qh @ kh.transpose(0, 1, 3, 2)) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = (attn @ vh).transpose(0, 2, 1, 3)
        out = out.reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    dim: int
    num_heads: int
    skip_first_pe: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, queries, keys, q_pe, k_pe):
        d = self.dtype
        if self.skip_first_pe:
            # official SAM first layer REPLACES queries with the
            # self-attention output (no residual)
            queries = TwoWayAttention(self.dim, self.num_heads, dtype=d,
                                      name="self_attn")(queries, queries,
                                                        queries)
        else:
            qq = queries + q_pe
            a0 = TwoWayAttention(self.dim, self.num_heads, dtype=d,
                                 name="self_attn")(qq, qq, queries)
            queries = queries + a0
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm1")(queries)
        a = TwoWayAttention(self.dim, self.num_heads, 2, dtype=d,
                            name="cross_attn_t2i")(
            queries + q_pe, keys + k_pe, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            queries + a)
        m = MLPBlock(self.dim, self.dim * 8, dtype=d,
                     name="mlp")(queries)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm3")(
            queries + m)
        a = TwoWayAttention(self.dim, self.num_heads, 2, dtype=d,
                            name="cross_attn_i2t")(
            keys + k_pe, queries + q_pe, queries)
        keys = nn.LayerNorm(dtype=jnp.float32, name="norm4")(keys + a)
        return queries, keys


class MaskDecoder(nn.Module):
    dim: int = 256
    num_heads: int = 8
    num_multimask: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse, dense):
        B = sparse.shape[0]
        n_tokens = self.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.dim), jnp.float32)
        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.normal(1.0),
                                 (n_tokens, self.dim), jnp.float32)
        tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token, (B, 1, self.dim)),
            jnp.broadcast_to(mask_tokens, (B, n_tokens, self.dim)),
            sparse.astype(jnp.float32)], axis=1).astype(self.dtype)

        h, w = image_embed.shape[-3:-1]
        src = (image_embed[None] if image_embed.ndim == 3
               else image_embed)
        src = jnp.broadcast_to(src, (B, h, w, self.dim)) + dense
        src = src.reshape(B, h * w, self.dim)
        pe = image_pe.reshape(1, h * w, self.dim)
        pe = jnp.broadcast_to(pe, (B, h * w, self.dim)).astype(src.dtype)

        q, k = tokens, src
        for i in range(2):
            q, k = TwoWayBlock(self.dim, self.num_heads,
                               skip_first_pe=(i == 0),
                               dtype=self.dtype, name=f"block{i}")(
                q, k, tokens, pe)
        # official final attention: query = queries + prompt tokens
        # (once); the residual adds onto queries, not query+tokens
        attn = TwoWayAttention(self.dim, self.num_heads, 2,
                               dtype=self.dtype,
                               name="final_attn")(q + tokens, k + pe, k)
        q = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(q + attn)

        iou_out = q[:, 0]
        mask_out = q[:, 1:1 + n_tokens]
        # upscale image features 4x
        up = k.reshape(B, h, w, self.dim)
        up = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale0")(up)
        up = nn.LayerNorm(dtype=jnp.float32, name="upscale_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="upscale1")(up)
        up = nn.gelu(up, approximate=False)
        # per-token hypernetwork MLPs
        hyper = []
        for t in range(n_tokens):
            y = mask_out[:, t]
            for li, feat in enumerate([self.dim, self.dim,
                                       self.dim // 8]):
                y = nn.Dense(feat, dtype=self.dtype,
                             name=f"hyper{t}_{li}")(y)
                if li < 2:
                    y = nn.relu(y)
            hyper.append(y)
        hyper = jnp.stack(hyper, 1)  # (B, n_tokens, dim//8)
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)
        # IoU prediction head
        y = iou_out
        for li, feat in enumerate([self.dim, self.dim, n_tokens]):
            y = nn.Dense(feat, dtype=jnp.float32,
                         name=f"iou{li}")(y)
            if li < 2:
                y = nn.relu(y)
        return masks.astype(jnp.float32), y


class SAM(nn.Module):
    """Full promptable segmentation model."""
    img_size: int = 1024
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    global_idx: Sequence[int] = (2, 5, 8, 11)
    dtype: Dtype = jnp.bfloat16
    # text/concept prompting (SAM3 surface): adds the TextEncoder
    # branch; off for official segment-anything checkpoints (their
    # param tree has no text tower)
    with_text: bool = False

    PIXEL_MEAN = (123.675, 116.28, 103.53)
    PIXEL_STD = (58.395, 57.12, 57.375)

    def setup(self):
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, dim=self.encoder_dim,
            depth=self.encoder_depth, num_heads=self.encoder_heads,
            global_idx=self.global_idx, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(image_size=self.img_size,
                                            dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)
        if self.with_text:
            self.text_encoder = TextEncoder(dtype=self.dtype)

    def encode(self, images):
        """images (B, H, W, 3) uint8/float -> (B, h, w, 256)."""
        mean = jnp.asarray(self.PIXEL_MEAN)
        std = jnp.asarray(self.PIXEL_STD)
        x = (images.astype(jnp.float32) - mean) / std
        return self.image_encoder(x.astype(self.dtype))

    def decode(self, image_embed, points, labels):
        """Prompt (points px coords + labels) -> (masks, iou)."""
        h, w = image_embed.shape[-3:-1]
        sparse, dense = self.prompt_encoder(points, labels, h, w)
        pe = self.prompt_encoder.dense_pe(h, w)
        return self.mask_decoder(image_embed, pe,
                                 sparse.astype(self.dtype),
                                 dense.astype(self.dtype))

    def decode_text(self, image_embed, token_ids):
        """Text/concept prompt (tokenize_text ids) -> (masks, iou):
        the text tokens take the sparse-prompt slot of the mask
        decoder (the SAM3 concept-prompt pathway)."""
        h, w = image_embed.shape[-3:-1]
        sparse = self.text_encoder(token_ids)
        dense = self.prompt_encoder.no_mask_embed.reshape(1, 1, 1, -1)
        dense = jnp.broadcast_to(
            dense, (token_ids.shape[0], h, w, dense.shape[-1]))
        pe = self.prompt_encoder.dense_pe(h, w)
        return self.mask_decoder(image_embed, pe,
                                 sparse.astype(self.dtype),
                                 dense.astype(self.dtype))

    def __call__(self, images, points, labels):
        emb = self.encode(images)
        return self.decode(emb, points, labels)


def box_to_prompt(box) -> tuple:
    """xyxy box -> (points (1,2,2), labels (1,2)) SAM box prompt."""
    x0, y0, x1, y1 = box
    pts = np.array([[[x0, y0], [x1, y1]]], np.float32)
    lbl = np.array([[2, 3]], np.int32)
    return pts, lbl


def convert_sam_checkpoint(sd: dict) -> dict:
    """Official segment-anything state dict -> flax variables.

    Maps image_encoder.* / prompt_encoder.* / mask_decoder.* tensor
    names onto the module tree above (conv OIHW->HWIO, linear
    transpose). Supports ViT-B-shaped encoders."""
    import numpy as _np

    def t(key):
        v = sd[key]
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else _np.asarray(v)

    def lin(prefix):
        return {"kernel": t(prefix + ".weight").T,
                "bias": t(prefix + ".bias")}

    def ln(prefix):
        return {"scale": t(prefix + ".weight"),
                "bias": t(prefix + ".bias")}

    enc: dict = {}
    enc["patch_embed"] = {
        "kernel": t("image_encoder.patch_embed.proj.weight"
                    ).transpose(2, 3, 1, 0),
        "bias": t("image_encoder.patch_embed.proj.bias")}
    enc["pos_embed"] = t("image_encoder.pos_embed")
    depth = 0
    while f"image_encoder.blocks.{depth}.norm1.weight" in sd:
        depth += 1
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        blk = {
            "norm1": ln(p + ".norm1"),
            "norm2": ln(p + ".norm2"),
            "attn": {
                "qkv": lin(p + ".attn.qkv"),
                "proj": lin(p + ".attn.proj"),
                "rel_pos_h": t(p + ".attn.rel_pos_h"),
                "rel_pos_w": t(p + ".attn.rel_pos_w"),
            },
            "mlp": {"lin1": lin(p + ".mlp.lin1"),
                    "lin2": lin(p + ".mlp.lin2")},
        }
        enc[f"block{i}"] = blk
    enc["neck0"] = {"kernel": t("image_encoder.neck.0.weight"
                                ).transpose(2, 3, 1, 0)}
    enc["neck1"] = ln("image_encoder.neck.1")
    enc["neck2"] = {"kernel": t("image_encoder.neck.2.weight"
                                ).transpose(2, 3, 1, 0)}
    enc["neck3"] = ln("image_encoder.neck.3")

    pe = {
        "pe_gaussian": t(
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embeddings": _np.stack([
            t(f"prompt_encoder.point_embeddings.{i}.weight")[0]
            for i in range(4)]),
        "not_a_point": t("prompt_encoder.not_a_point_embed.weight"),
        "no_mask_embed": t("prompt_encoder.no_mask_embed.weight"),
    }

    def twoway(prefix):
        def at(p2):
            return {"q_proj": lin(prefix + p2 + ".q_proj"),
                    "k_proj": lin(prefix + p2 + ".k_proj"),
                    "v_proj": lin(prefix + p2 + ".v_proj"),
                    "out_proj": lin(prefix + p2 + ".out_proj")}
        return at

    md: dict = {
        "iou_token": t("mask_decoder.iou_token.weight"),
        "mask_tokens": t("mask_decoder.mask_tokens.weight"),
    }
    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}"
        at = twoway(p)
        md[f"block{i}"] = {
            "self_attn": at(".self_attn"),
            "cross_attn_t2i": at(".cross_attn_token_to_image"),
            "cross_attn_i2t": at(".cross_attn_image_to_token"),
            "norm1": ln(p + ".norm1"),
            "norm2": ln(p + ".norm2"),
            "norm3": ln(p + ".norm3"),
            "norm4": ln(p + ".norm4"),
            "mlp": {"lin1": lin(p + ".mlp.lin1"),
                    "lin2": lin(p + ".mlp.lin2")},
        }
    at = twoway("mask_decoder.transformer")
    md["final_attn"] = at(".final_attn_token_to_image")
    md["final_norm"] = ln("mask_decoder.transformer.norm_final_attn")
    # torch ConvTranspose2d weight is (in, out, kH, kW); flax
    # nn.ConvTranspose expects (kH, kW, in, out) and correlates the
    # UNflipped kernel where torch's transposed conv places w[di,dj]
    # at output offset (di,dj) — i.e. the flax kernel must be the
    # spatial mirror (validated numerically vs tests/sam_torch_ref.py)
    def convt(key):
        return t(key).transpose(2, 3, 0, 1)[::-1, ::-1].copy()

    md["upscale0"] = {
        "kernel": convt("mask_decoder.output_upscaling.0.weight"),
        "bias": t("mask_decoder.output_upscaling.0.bias")}
    md["upscale_norm"] = ln("mask_decoder.output_upscaling.1")
    md["upscale1"] = {
        "kernel": convt("mask_decoder.output_upscaling.3.weight"),
        "bias": t("mask_decoder.output_upscaling.3.bias")}
    for ti in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{ti}.layers"
        for li in range(3):
            md[f"hyper{ti}_{li}"] = lin(f"{p}.{li}")
    for li in range(3):
        md[f"iou{li}"] = lin(
            f"mask_decoder.iou_prediction_head.layers.{li}")

    return {"params": {"image_encoder": enc, "prompt_encoder": pe,
                       "mask_decoder": md}}
