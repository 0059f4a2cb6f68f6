"""CLIP-style ViT image encoder + RGB-D fusion (Flax).

Parity target: reference internnav/model/encoder/image_clip_encoder.py —
`ImageEncoder` with modes:
- 'cls': CLS embedding of the CLIP visual tower, projected; depth token
  added elementwise then LayerNorm (image_clip_encoder.py:396-409).
- 'multi_patches_avg_pooling' (encode_image_multi_patches:218-259): the
  14x14 patch grid is avg-pooled into 2x2 quadrants → 4 tokens, prepended
  with CLS → 5 tokens; the depth embedding is added onto token 0.

The ViT matches OpenAI CLIP ViT-B/16 structure (pre-norm, quickGELU) so
HF/CLIP weights convert directly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from internnav_tpu.model.encoder.resnet import HabitatResNetEncoder
from internnav_tpu.model.encoder.transformer import MultiHeadAttention


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPVitBlock(nn.Module):
    width: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        xn = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        h, _ = MultiHeadAttention(self.width, self.heads, name="attn")(xn, xn, xn)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(self.width * 4, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, name="c_proj")(y)
        return x + y


class CLIPVisionTower(nn.Module):
    """(B, H, W, 3) normalized pixels → (B, 1+P, width) token features."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16

    @nn.compact
    def __call__(self, pixels):
        B = pixels.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    name="conv1")(pixels)
        x = x.reshape(B, -1, self.width)  # (B, P, width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (B, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (x.shape[1], self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = CLIPVitBlock(self.width, self.heads, name=f"block_{i}")(x)
        return x  # NOTE: no ln_post — multi-patch path uses raw tokens


class CLIPImageEncoder(nn.Module):
    """RGB-D fusion encoder (reference ImageEncoder).

    __call__(rgb (B, 224, 224, 3) raw 0-255, depth (B, 256, 256, 1)) →
    (B, 5, proj_dim) tokens for multi_patches mode, (B, 1, proj_dim) for cls.
    """

    projection_dim: int = 512
    img_mod: str = "multi_patches_avg_pooling"  # cls | multi_patches_avg_pooling
    depth_output_size: int = 128
    vit_width: int = 768
    vit_layers: int = 12
    vit_heads: int = 12

    @nn.compact
    def __call__(self, rgb, depth):
        # CLIP pixel normalization
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        pixels = (rgb.astype(jnp.float32) / 255.0 - mean) / std
        tokens = CLIPVisionTower(self.vit_width, self.vit_layers, self.vit_heads,
                                 name="visual")(pixels)  # (B, 1+P, W)

        # depth tower: DD-PPO GN ResNet + spatial embeddings (the reference
        # uses VlnResnetDepthEncoder(spatial_output=True); image_clip_
        # encoder.py:52-69) → flatten → linear
        from internnav_tpu.model.encoder.resnet import VlnResnetDepthEncoder

        d = VlnResnetDepthEncoder(spatial_output=True,
                                  name="depth_encoder")(depth)  # (B, S, C+64)
        d = d.reshape(d.shape[0], -1)
        d = nn.Dense(self.vit_width, name="depth_linear")(d)  # match rgb width

        img_proj = nn.Dense(self.projection_dim, name="img_learnable_linear")
        depth_proj = nn.Dense(self.projection_dim, name="depth_learnable_linear")

        if self.img_mod == "cls":
            fused = img_proj(tokens[:, 0]) + depth_proj(d)
            fused = nn.LayerNorm(epsilon=1e-5, name="fuse_ln")(fused)
            return fused[:, None, :]

        # multi-patch: quadrant-average the patch grid
        B, P1, W = tokens.shape
        grid = int(round((P1 - 1) ** 0.5))
        patches = tokens[:, 1:].reshape(B, grid, grid, W)
        half = grid // 2
        quads = patches[:, : 2 * half, : 2 * half].reshape(B, 2, half, 2, half, W)
        pooled = quads.mean(axis=(2, 4)).reshape(B, 4, W)
        five = jnp.concatenate([tokens[:, :1], pooled], axis=1)  # (B, 5, W)
        out = img_proj(five)
        out = out.at[:, 0].add(depth_proj(d))
        return out
