"""Shared transformer building blocks (Flax).

One attention/block toolkit reused by the BERT text encoder, cross-modal
encoders, CLIP ViT, the diffusion transformers, and the NavDP/NextDiT
heads — the reference instead vendors four separate transformer stacks
(bert_backbone.py, image_clip_encoder.py, diffusion_policy, nextdit).

Attention runs through ops.flash_attention (Pallas on TPU, XLA reference
on CPU) when sequences are long enough to matter; otherwise plain einsum
which XLA fuses fine.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.ops.flash_attention import flash_attention, mha_reference


class MultiHeadAttention(nn.Module):
    """Torch nn.MultiheadAttention-compatible parameterization: packed qkv
    when q/k dims match (converter maps in_proj_weight), separate heads.

    key_padding_mask: (B, S) True = masked OUT (torch convention).
    attn_mask: (T, S) additive or boolean (True = keep) — boolean used here.
    """

    embed_dim: int
    num_heads: int
    use_flash_min_len: int = 512

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, attn_mask=None,
                 deterministic=True):
        B, T, _ = query.shape
        S = key.shape[1]
        H = self.num_heads
        D = self.embed_dim // H

        q = nn.Dense(self.embed_dim, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, name="k_proj")(key)
        v = nn.Dense(self.embed_dim, name="v_proj")(value)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(D)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None], scores, -1e9)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], -1e9, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        if attn_mask is not None:
            # torch SDPA zeroes fully-masked rows (NavDP's anti-causal mask
            # blocks the last waypoint entirely); softmax alone would give
            # uniform garbage there
            probs = jnp.where(attn_mask.any(-1)[None, None, :, None], probs, 0.0)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out), probs


class TransformerEncoderLayer(nn.Module):
    """Pre- or post-norm encoder layer (torch TransformerEncoderLayer)."""

    d_model: int
    n_head: int
    dim_feedforward: Optional[int] = None
    norm_first: bool = True
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, deterministic=True):
        ff = self.dim_feedforward or 4 * self.d_model
        act = dict(gelu=lambda y: nn.gelu(y, approximate=False), relu=nn.relu, mish=lambda y: y * jnp.tanh(nn.softplus(y)))[self.activation]
        attn = MultiHeadAttention(self.d_model, self.n_head, name="self_attn")
        if self.norm_first:
            xn = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
            h, _ = attn(xn, xn, xn, key_padding_mask, attn_mask)
            x = x + h
            y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            y = nn.Dense(ff, name="linear1")(y)
            y = act(y)
            y = nn.Dense(self.d_model, name="linear2")(y)
            return x + y
        else:
            h, _ = attn(x, x, x, key_padding_mask, attn_mask)
            x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
            y = nn.Dense(ff, name="linear1")(x)
            y = act(y)
            y = nn.Dense(self.d_model, name="linear2")(y)
            return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer (torch TransformerDecoderLayer norm_first)."""

    d_model: int
    n_head: int
    dim_feedforward: Optional[int] = None
    activation: str = "gelu"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_key_padding_mask=None,
                 memory_mask=None, deterministic=True):
        ff = self.dim_feedforward or 4 * self.d_model
        act = dict(gelu=lambda y: nn.gelu(y, approximate=False), relu=nn.relu)[self.activation]
        tn = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        h, _ = MultiHeadAttention(self.d_model, self.n_head, name="self_attn")(
            tn, tn, tn, None, tgt_mask,
        )
        x = tgt + h
        h, _ = MultiHeadAttention(self.d_model, self.n_head, name="cross_attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), memory, memory,
            memory_key_padding_mask, memory_mask,
        )
        x = x + h
        y = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        y = nn.Dense(ff, name="linear1")(y)
        y = act(y)
        y = nn.Dense(self.d_model, name="linear2")(y)
        return x + y


class SinusoidalPosEmb(nn.Module):
    """Diffusion timestep embedding (diffusion_policy positional_embedding)."""

    dim: int

    def __call__(self, t):
        half = self.dim // 2
        freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / (half - 1))
        ang = t.astype(jnp.float32)[:, None] * freqs[None]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def fixed_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Fixed sin/cos table (reference bert_backbone.py:655 PositionalEncoding)."""
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: (dim + 1) // 2])
    return pe


def causal_mask(T: int) -> jnp.ndarray:
    """(T, T) boolean, True = attend (lower triangle)."""
    return jnp.tril(jnp.ones((T, T), dtype=bool))
