"""Transformer denoiser for diffusion policies (Flax).

Parity target: the reference's modified diffusion_policy transformer
(basemodel/diffusion_policy_modified/transformer_for_diffusion_modified.py):
time token + per-type-embedded condition tokens → optional condition
encoder → memory; noisy action tokens decode over memory with causal
self-attention and the shifted memory mask; cond_mask implements
classifier-free guidance token masking. Also DistanceNetwork (reference
encoder/distance_encoder.py:4).

TPU notes: the whole module is shape-static so the full denoise loop runs
as one lax.scan (see ops.schedulers); dropout omitted at inference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from internnav_tpu.model.encoder.transformer import (
    SinusoidalPosEmb,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    causal_mask,
)


class TransformerForDiffusion(nn.Module):
    input_dim: int
    output_dim: int
    horizon: int
    n_obs_steps: int
    cond_dim: int
    n_emb: int = 512
    n_layer: int = 6
    n_cond_layers: int = 0
    head_dim: int = 64
    causal_attn: bool = True

    @nn.compact
    def __call__(self, sample, timestep, cond, type_embeds=None, cond_mask=None):
        """sample: (B, T, input_dim) noisy actions; timestep: (B,) or scalar;
        cond: (B, n_obs_steps, cond_dim); type_embeds: (B, n_obs_steps, n_emb);
        cond_mask: (B, 1 + n_obs_steps) 1 = mask out (CFG null token mask).
        """
        n_head = max(1, self.n_emb // self.head_dim)
        B, T, _ = sample.shape
        t = jnp.broadcast_to(jnp.asarray(timestep).reshape(-1), (B,))
        time_emb = SinusoidalPosEmb(self.n_emb)(t)[:, None]  # (B, 1, E)

        cond_obs = nn.Dense(self.n_emb, name="cond_obs_emb")(cond)
        if type_embeds is not None:
            cond_obs = cond_obs + type_embeds
        cond_tokens = jnp.concatenate([time_emb, cond_obs], axis=1)
        Tc = cond_tokens.shape[1]
        cond_pos = self.param("cond_pos_emb", nn.initializers.normal(0.02),
                              (1, 1 + self.n_obs_steps, self.n_emb))
        x = cond_tokens + cond_pos[:, :Tc]
        if self.n_cond_layers > 0:
            for i in range(self.n_cond_layers):
                x = TransformerEncoderLayer(self.n_emb, n_head, norm_first=True,
                                            name=f"cond_layer_{i}")(x)
        else:
            y = nn.Dense(4 * self.n_emb, name="cond_mlp_1")(x)
            y = y * jnp.tanh(nn.softplus(y))  # Mish
            x = nn.Dense(self.n_emb, name="cond_mlp_2")(y)
        memory = x

        inp = nn.Dense(self.n_emb, name="input_emb")(sample)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, self.horizon, self.n_emb))
        x = inp + pos[:, :T]

        tgt_mask = causal_mask(T) if self.causal_attn else None
        # shifted memory mask: action step t may see cond tokens s with
        # t >= s - 1 (time token is s=0) — reference :125-129
        mem_mask = None
        if self.causal_attn:
            tt = jnp.arange(T)[:, None]
            ss = jnp.arange(Tc)[None, :]
            mem_mask = tt >= (ss - 1)

        kpm = cond_mask.astype(bool) if cond_mask is not None else None
        for i in range(self.n_layer):
            x = TransformerDecoderLayer(self.n_emb, n_head, name=f"dec_layer_{i}")(
                x, memory, tgt_mask=tgt_mask, memory_key_padding_mask=kpm,
                memory_mask=mem_mask,
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        return nn.Dense(self.output_dim, name="head")(x)


class DistanceNetwork(nn.Module):
    """3-layer MLP head with optional sigmoid output (reference
    distance_encoder.py:4): used for distance / progress / stop-progress."""

    normalize: bool = True

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.relu(nn.Dense(d // 4, name="fc1")(x))
        x = nn.relu(nn.Dense(d // 16, name="fc2")(x))
        x = nn.Dense(1, name="fc3")(x)
        return nn.sigmoid(x) if self.normalize else x
