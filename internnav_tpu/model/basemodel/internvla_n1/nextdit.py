"""NextDiT trajectory decoder (Flax) — the InternVLA-N1 System-1 DiT head.

Parity target: the reference's Lumina-NextDiT repurposed for 1-D action
sequences (internnav/model/basemodel/internvla_n1/nextdit_traj.py:181-368,
nextdit_crossattn_traj.py:48-95): 12 layers, dim 384, 6 heads, RMSNorm
with AdaLN-zero gating from a combined timestep+caption embedding,
self-attention + tanh-gated cross-attention onto the projected VLM latents
(768-d), SwiGLU feed-forward with multiple_of rounding, continuous
LayerNorm output head. The action sequence enters pre-embedded (action
encoder lives in the parent model), so no patchify and no image rotary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.ops.flash_attention import flash_attention


@dataclasses.dataclass(frozen=True)
class NextDiTConfig:
    dim: int = 384
    n_layers: int = 12
    n_heads: int = 6
    n_kv_heads: int = 6
    multiple_of: int = 256
    norm_eps: float = 1e-5
    latent_embedding_size: int = 768  # cross-attention conditioning width
    qk_norm: bool = True
    time_freq_dim: int = 256
    #: activation/compute dtype. bf16 matches the torch reference's
    #: deployment (the whole dual-system model loads bf16,
    #: internvla_n1_trainer.py / internvla_n1_policy.py); softmax, RMSNorm
    #: statistics and the Euler scheduler stay fp32.
    dtype: Any = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "NextDiTConfig":
        return cls(dim=32, n_layers=2, n_heads=4, n_kv_heads=4, multiple_of=16,
                   latent_embedding_size=48, time_freq_dim=16)


class _RMSNorm(nn.Module):
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        y = (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            y = y * self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return y


def _timestep_freqs(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class TimeCaptionEmbed(nn.Module):
    """Combined timestep + pooled-caption conditioning (diffusers
    LuminaCombinedTimestepCaptionEmbedding semantics)."""

    hidden: int
    caption_dim: int
    freq_dim: int = 256

    @nn.compact
    def __call__(self, timestep, captions, caption_mask):
        tf = _timestep_freqs(timestep, self.freq_dim)
        t = nn.Dense(self.hidden, name="time_fc1")(tf)
        t = nn.silu(t)
        t = nn.Dense(self.hidden, name="time_fc2")(t)
        m = caption_mask.astype(jnp.float32)[..., None]
        pooled = (captions * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-6)
        c = nn.LayerNorm(epsilon=1e-5, name="cap_ln")(pooled)
        c = nn.Dense(self.hidden, name="cap_fc")(c)
        return t + c


class GQAAttention(nn.Module):
    """Lumina attention: no biases, optional cross-kv dim, per-head
    layer-norm qk normalization; returns per-head outputs (B, T, H, D)."""

    dim: int
    heads: int
    kv_heads: int
    kv_dim: Optional[int] = None
    qk_norm: bool = True

    @nn.compact
    def __call__(self, x, kv, kv_mask=None):
        H, KV = self.heads, self.kv_heads
        D = self.dim // H
        kv_dim = self.kv_dim or self.dim
        q = nn.Dense(H * D, use_bias=False, name="to_q")(x)
        k = nn.Dense(KV * D, use_bias=False, name="to_k")(kv)
        v = nn.Dense(KV * D, use_bias=False, name="to_v")(kv)
        B, T = x.shape[:2]
        S = kv.shape[1]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, S, KV, D)
        v = v.reshape(B, S, KV, D)
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-5, name="norm_q")(q.reshape(B, T, H * D)).reshape(B, T, H, D)
            k = nn.LayerNorm(epsilon=1e-5, name="norm_k")(k.reshape(B, S, KV * D)).reshape(B, S, KV, D)
        if KV != H:
            k = jnp.repeat(k, H // KV, axis=2)
            v = jnp.repeat(v, H // KV, axis=2)
        # Batched attention over thousands of short (24-36 token) rows.
        # bf16 matmul inputs with fp32 accumulation — the MXU's native
        # mode and what torch bf16 SDPA does; softmax stays fp32.
        # (A packed-sequence flash-kernel variant was tried and REVERTED:
        # without masked-tile skipping the packed form computes the full
        # (B*T)x(B*S) score matrix — quadratic in rows — and benched 3x
        # slower than this batched einsum at serving shapes.)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(D)
        if kv_mask is not None:
            scores = jnp.where(kv_mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)  # (B, T, H, D)


class LuminaFeedForward(nn.Module):
    dim: int
    multiple_of: int

    @nn.compact
    def __call__(self, x):
        inner = int(2 * (4 * self.dim) / 3)
        inner = self.multiple_of * ((inner + self.multiple_of - 1) // self.multiple_of)
        g = nn.Dense(inner, use_bias=False, name="linear_1")(x)
        u = nn.Dense(inner, use_bias=False, name="linear_3")(x)
        return nn.Dense(self.dim, use_bias=False, name="linear_2")(nn.silu(g) * u)


class NextDiTBlock(nn.Module):
    cfg: NextDiTConfig

    @nn.compact
    def __call__(self, x, cond, cond_mask, temb, num_samples: int = 1):
        """x: (B*num_samples, T, dim); cond/temb: (B, ...) — per-condition
        tensors stay at batch B, broadcast over the diffusion samples
        (sample i*num_samples+j conditions on batch row i)."""
        c = self.cfg
        H = c.n_heads
        ns = num_samples
        B = temb.shape[0]
        T = x.shape[1]

        def bc(g):  # (B, dim) gate/scale → (B*ns, 1, dim)
            if ns == 1:
                return g[:, None]
            return jnp.repeat(g, ns, axis=0)[:, None]

        # AdaLN-zero style gates from temb (LuminaRMSNormZero)
        emb = nn.Dense(4 * c.dim, name="norm1_linear")(nn.silu(temb))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(emb, 4, axis=-1)
        xn = _RMSNorm(c.norm_eps, name="norm1_rms")(x) * (1 + bc(scale_msa))

        self_out = GQAAttention(c.dim, H, c.n_kv_heads, qk_norm=c.qk_norm,
                                name="attn1")(xn, xn)
        cond_n = _RMSNorm(c.norm_eps, name="norm1_context")(cond)
        # cross attention: K/V are per-CONDITION — fold the samples into the
        # query sequence (B, ns*T) so cond projections run at batch B, not
        # B*ns (the 32-sample serving denoise recomputed them 32x per Euler
        # step before this)
        xq = xn.reshape(B, ns * T, c.dim) if ns > 1 else xn
        cross_out = GQAAttention(c.dim, H, c.n_kv_heads, kv_dim=c.dim,
                                 qk_norm=c.qk_norm, name="attn2")(xq, cond_n, cond_mask)
        if ns > 1:
            cross_out = cross_out.reshape(B * ns, T, H, -1)
        gate = self.param("gate", nn.initializers.zeros, (H,))
        cross_out = cross_out * jnp.tanh(gate)[None, None, :, None]
        mixed = (self_out + cross_out).reshape(x.shape[0], x.shape[1], c.dim)
        mixed = nn.Dense(c.dim, use_bias=False, name="to_out")(mixed)
        x = x + jnp.tanh(bc(gate_msa)) * _RMSNorm(c.norm_eps, name="norm2")(mixed)

        y = LuminaFeedForward(c.dim, c.multiple_of, name="feed_forward")(
            _RMSNorm(c.norm_eps, name="ffn_norm1")(x) * (1 + bc(scale_mlp))
        )
        x = x + jnp.tanh(bc(gate_mlp)) * _RMSNorm(c.norm_eps, name="ffn_norm2")(y)
        return x


class NextDiT(nn.Module):
    """x: pre-embedded action features (B*num_samples, T, dim); timestep
    (B,); z_latents: conditioning tokens (B, L, latent_embedding_size).
    Returns (B*num_samples, T, dim) (the parent's action_decoder maps to 3).

    num_samples > 1 folds diffusion-sample replication out of the
    conditioning path: caption projection, timestep/caption embedding and
    the per-layer cross-attention K/V all run at batch B while only the
    noisy-trajectory stream runs at B*num_samples — bit-equal to repeating
    z_latents num_samples times (row i*num_samples+j ↔ condition i)."""

    cfg: NextDiTConfig

    @nn.compact
    def __call__(self, x, timestep, z_latents, latents_mask=None,
                 num_samples: int = 1):
        c = self.cfg
        x = x.astype(c.dtype)
        z_latents = z_latents.astype(c.dtype)
        if latents_mask is None:
            latents_mask = jnp.ones(z_latents.shape[:2], bool)
        # caption projection (PixArtAlphaTextProjection)
        cond = nn.Dense(c.dim, name="caption_fc1")(z_latents)
        cond = nn.gelu(cond, approximate=True)
        cond = nn.Dense(c.dim, name="caption_fc2")(cond)

        temb = TimeCaptionEmbed(min(c.dim, 1024), c.dim, c.time_freq_dim,
                                name="time_caption_embed")(timestep, cond, latents_mask)
        temb = temb.astype(c.dtype)
        for i in range(c.n_layers):
            x = NextDiTBlock(c, name=f"layers_{i}")(x, cond, latents_mask,
                                                    temb, num_samples)
        # LuminaLayerNormContinuous out: scale-conditioned LayerNorm + an
        # output Linear (out_dim = in_channels; nextdit_traj.py:283-290
        # sets out_dim=patch_size^2*out_channels=384, so diffusers'
        # LuminaLayerNormContinuous instantiates linear_2)
        scale = nn.Dense(c.dim, name="norm_out_linear")(nn.silu(temb))
        if num_samples > 1:
            scale = jnp.repeat(scale, num_samples, axis=0)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="norm_out_ln")(x) * (1 + scale[:, None])
        return nn.Dense(c.dim, name="norm_out_linear2")(x)
