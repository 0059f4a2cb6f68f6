"""NavDP backbones (Flax).

Parity targets in the reference's internnav/model/encoder/navdp_backbone.py:
- RGBDBackbone (:205-290): two DINOv2 ViT-S towers (rgb, depth-as-3ch) over
  a memory_size frame stack → (memory+1)*256 tokens + learned PE → 2-layer
  transformer-decoder "former" queried by memory_size*16 learned queries →
  linear projection to token_dim.
- ImageGoalBackbone (:316): ViT-S with 6-channel patch embed, mean-pooled.
- PixelGoalBackbone (:379): same with 7 channels.
- TokenCompressor (:61-100): cross-attention pooling onto target_length
  learned queries.

Layout note: inputs are NHWC float images; depth arrives (B, T, H, W, 1)
and is broadcast to 3 channels like the reference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from internnav_tpu.model.encoder.transformer import (
    MultiHeadAttention,
    TransformerDecoderLayer,
    fixed_positional_encoding,
)
from internnav_tpu.model.encoder.vit import DinoViT, imagenet_normalize


class FormerDecoder(nn.Module):
    """N-layer post-norm torch TransformerDecoder (batch_first, default
    norm_last=False i.e. post-norm)."""

    dim: int
    heads: int
    layers: int
    norm_first: bool = False
    dim_feedforward: int = 0  # 0 -> 4*dim (matches torch default 2048 at dim 512)

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None):
        x = tgt
        for i in range(self.layers):
            if self.norm_first:
                x = TransformerDecoderLayer(self.dim, self.heads, name=f"layer_{i}")(
                    x, memory, tgt_mask=tgt_mask, memory_mask=memory_mask
                )
            else:
                # torch post-norm decoder layer
                h, _ = MultiHeadAttention(self.dim, self.heads, name=f"layer_{i}_self")(
                    x, x, x, None, tgt_mask
                )
                x = nn.LayerNorm(name=f"layer_{i}_ln1")(x + h)
                h, _ = MultiHeadAttention(self.dim, self.heads, name=f"layer_{i}_cross")(
                    x, memory, memory, None, memory_mask
                )
                x = nn.LayerNorm(name=f"layer_{i}_ln2")(x + h)
                y = nn.Dense(self.dim_feedforward or 4 * self.dim,
                             name=f"layer_{i}_ff1")(x)
                y = nn.relu(y)
                y = nn.Dense(self.dim, name=f"layer_{i}_ff2")(y)
                x = nn.LayerNorm(name=f"layer_{i}_ln3")(x + y)
        return x


class RGBDBackbone(nn.Module):
    image_size: int = 224
    embed_size: int = 512
    memory_size: int = 8
    token_dim: int = 384

    @nn.compact
    def __call__(self, images, depths):
        """images: (B, T, H, W, 3) in [0, 255] or [0,1]; depths: (B, T, H, W, 1)
        metric, pre-clamped. → memory tokens (B, memory_size*16, embed_size)."""
        B, T = images.shape[:2]
        rgb = images.reshape((-1,) + images.shape[2:]).astype(jnp.float32)
        rgb = imagenet_normalize(rgb)  # caller scales to [0, 1]
        rgb_tokens = DinoViT(name="rgb_model")(rgb)  # (B*T, 256, 384)
        rgb_tokens = rgb_tokens.reshape(B, -1, self.token_dim)

        d = depths.reshape((-1,) + depths.shape[2:]).astype(jnp.float32)
        d3 = jnp.repeat(d, 3, axis=-1)
        depth_tokens = DinoViT(name="depth_model")(d3)
        depth_tokens = depth_tokens.reshape(B, -1, self.token_dim)

        tokens = jnp.concatenate([rgb_tokens, depth_tokens], axis=1)
        pe = nn.Embed(2 * self.memory_size * 256, self.token_dim, name="former_pe")(
            jnp.arange(tokens.shape[1])
        )
        tokens = tokens + pe[None]
        queries = nn.Embed(self.memory_size * 16, self.token_dim, name="former_query")(
            jnp.arange(self.memory_size * 16)
        )
        queries = jnp.broadcast_to(queries[None], (B,) + queries.shape)
        memory_tokens = FormerDecoder(self.token_dim, 8, 2, name="former_net")(
            queries, tokens
        )
        return nn.Dense(self.embed_size, name="project_layer")(memory_tokens)


class ImageGoalBackbone(nn.Module):
    """(B, H, W, 6) stacked goal+current image → (B, embed_size)."""

    embed_size: int = 512

    @nn.compact
    def __call__(self, images):
        tokens = DinoViT(in_channels=6, name="imagegoal_encoder")(images.astype(jnp.float32))
        return nn.Dense(self.embed_size, name="project_layer")(tokens.mean(axis=1))


class PixelGoalBackbone(nn.Module):
    """(B, H, W, pixel_channel) → (B, embed_size)."""

    embed_size: int = 512
    pixel_channel: int = 7

    @nn.compact
    def __call__(self, images):
        tokens = DinoViT(in_channels=self.pixel_channel, name="pixelgoal_encoder")(
            images.astype(jnp.float32)
        )
        return nn.Dense(self.embed_size, name="project_layer")(tokens.mean(axis=1))


class TokenCompressor(nn.Module):
    """Cross-attention pooling onto target_length learned queries
    (navdp_backbone.py:61-100)."""

    embed_dim: int
    num_heads: int
    target_length: int

    @nn.compact
    def __call__(self, x, padding_mask=None):
        B = x.shape[0]
        tok_pe = nn.Embed(5000, self.embed_dim, name="token_pe")(jnp.arange(x.shape[1]))
        x = x + tok_pe[None]
        q = nn.Embed(self.target_length, self.embed_dim, name="target_embedding")(
            jnp.arange(self.target_length)
        )
        q_pe = nn.Embed(5000, self.embed_dim, name="query_pe")(jnp.arange(self.target_length))
        q = jnp.broadcast_to((q + q_pe)[None], (B, self.target_length, self.embed_dim))
        out, _ = MultiHeadAttention(self.embed_dim, self.num_heads, name="cross_attention")(
            q, x, x, padding_mask
        )
        return out
