"""InternVLA-N1 embedded NavDP System-1 head (Flax).

Parity target: reference internnav/model/basemodel/internvla_n1/navdp.py
(NavDP_Policy_DPT_CriticSum_DAT:16-313): memory_size=2 RGBD former
backbone, vlm_embed_mlp (3584 → …/4 → …/8 → 384), goal TokenCompressor
(1 query), cond = [time, vlm_goal, rgbd(memory*16)] with learned cond PE
(memory*16 + 2 slots), temporal_depth=16 pre-norm decoder over
predict_size=32 waypoints, DDPM T=20 ε-prediction; async variant denoises
sample_num trajectories with the goal-compressed conditioning
(predict_pointgoal_action_async:197-253), sync variant mean-pools vlm
tokens (:255-289); forward_vlm_traj (:291-312) is the training path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from internnav_tpu.model.encoder.navdp_backbone import (
    FormerDecoder,
    RGBDBackbone,
    TokenCompressor,
)
from internnav_tpu.model.encoder.transformer import SinusoidalPosEmb, causal_mask
from internnav_tpu.ops.schedulers import DDPMScheduler


class NavDPHead(nn.Module):
    memory_size: int = 2
    predict_size: int = 32
    temporal_depth: int = 16
    heads: int = 8
    token_dim: int = 384
    vlm_token_dim: int = 3584

    def setup(self):
        D = self.token_dim
        self.rgbd_encoder = RGBDBackbone(embed_size=D, memory_size=self.memory_size,
                                         token_dim=384)
        self.point_encoder = nn.Dense(D)
        self.decoder = FormerDecoder(D, self.heads, self.temporal_depth, norm_first=True)
        self.input_embed = nn.Dense(D)
        self.cond_pos_embed = self.param(
            "cond_pos_embed", nn.initializers.zeros,
            (1, self.memory_size * 16 + 2, D),
        )
        self.out_pos_embed = self.param(
            "out_pos_embed", nn.initializers.zeros, (1, self.predict_size, D),
        )
        self.time_emb = SinusoidalPosEmb(D)
        self.final_ln = nn.LayerNorm()
        self.action_head = nn.Dense(3)
        self.critic_head = nn.Dense(1)
        self.vlm_embed_mlp = [
            nn.Dense(self.vlm_token_dim // 4), nn.Dense(self.vlm_token_dim // 8),
            nn.Dense(self.token_dim),
        ]
        self.goal_compressor = TokenCompressor(D, 8, 1)
        self.scheduler = DDPMScheduler(
            num_train_timesteps=20, beta_schedule="squaredcos_cap_v2",
            clip_sample=True, prediction_type="epsilon",
        )

    def _vlm_mlp(self, x):
        x = nn.relu(self.vlm_embed_mlp[0](x))
        x = nn.relu(self.vlm_embed_mlp[1](x))
        return self.vlm_embed_mlp[2](x)

    def predict_noise(self, noisy_actions, t, goal_embed, rgbd_embed=None):
        B = noisy_actions.shape[0]
        time_embeds = self.time_emb(jnp.broadcast_to(jnp.asarray(t).reshape(-1), (B,)))[:, None]
        parts = [time_embeds, jnp.broadcast_to(goal_embed, (B,) + goal_embed.shape[1:])]
        if rgbd_embed is not None:
            parts.append(jnp.broadcast_to(rgbd_embed, (B,) + rgbd_embed.shape[1:]))
        cond = jnp.concatenate(parts, axis=1)
        cond = cond + self.cond_pos_embed[:, : cond.shape[1]]
        x = self.input_embed(noisy_actions) + self.out_pos_embed[:, : self.predict_size]
        out = self.decoder(x, cond, tgt_mask=causal_mask(self.predict_size))
        return self.action_head(self.final_ln(out))

    # ------------------------------------------------------------- training
    def forward_vlm_traj(self, vlm_tokens, input_images, input_depths,
                         label_actions, rng):
        """vlm_tokens (B, L, 3584); images (B, M, H, W, 3); label_actions
        (B, P, 3) (already flattened). → (eps_pred, noise)."""
        vlm = self._vlm_mlp(vlm_tokens)
        goal = self.goal_compressor(vlm)  # (B, 1, D)
        B = label_actions.shape[0]
        t = jax.random.randint(rng, (B,), 0, self.scheduler.num_train_timesteps)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), label_actions.shape)
        noisy = self.scheduler.add_noise(label_actions, noise, t)
        rgbd = self.rgbd_encoder(input_images, input_depths)
        eps = self.predict_noise(noisy, t, goal, rgbd)
        return eps, noise

    # ------------------------------------------------------------ inference
    def predict_pointgoal_action_async(self, vlm_tokens, input_images,
                                       input_depths, rng, vlm_mask=None,
                                       sample_num: int = 32):
        """Async dual-system path: goal-compressed vlm latents + rgbd memory."""
        vlm = self._vlm_mlp(vlm_tokens[:1])
        pad = None if vlm_mask is None else ~(vlm_mask[:1].astype(bool))
        goal = self.goal_compressor(vlm, pad)
        rgbd = self.rgbd_encoder(input_images[:1], input_depths[:1])
        x_init = jax.random.normal(rng, (sample_num, self.predict_size, 3))
        return self.scheduler.denoise_scan(
            lambda x, t: self.predict_noise(x, t, goal, rgbd),
            x_init, jax.random.fold_in(rng, 1),
        )

    def predict_pointgoal_action(self, vlm_tokens, rng, vlm_mask=None,
                                 sample_num: int = 32):
        """Sync path: mean-pooled vlm tokens only (no rgbd memory)."""
        vlm = self._vlm_mlp(vlm_tokens[:1])
        goal = jnp.mean(vlm, axis=1, keepdims=True)
        x_init = jax.random.normal(rng, (sample_num, self.predict_size, 3))
        return self.scheduler.denoise_scan(
            lambda x, t: self.predict_noise(x, t, goal, None),
            x_init, jax.random.fold_in(rng, 1),
        )

    # -------------------------------------------------- batched inference
    # B independent episode streams through ONE denoise program (the
    # reference evaluates one episode per GPU rank — navdp.py:197-289 is
    # inherently B=1; batching is this framework's serving transform).
    # Row layout matches the nextdit batched path: sample i*sample_num+j
    # conditions on stream i, so serving._s1_outputs' (B, S, P, 3) reshape
    # applies unchanged. At B=1 the draws and shapes are identical to the
    # single-stream methods above, so results are bit-equal. At B>1 the
    # default draws one batch-wide noise (like nextdit); injecting per-row
    # x_init/step_noises reproduces each row's single-stream run to GEMM
    # reduction epsilon — row-independence is asserted that way in
    # tests/test_serving_navdp.py.

    def predict_pointgoal_action_async_batched(self, vlm_tokens, input_images,
                                               input_depths, rng,
                                               vlm_mask=None,
                                               sample_num: int = 32,
                                               x_init=None, step_noises=None):
        """vlm_tokens (B, L, D_vlm); images (B, M, H, W, 3); depths
        (B, M, H, W, 1) → (B*sample_num, P, 3)."""
        B = vlm_tokens.shape[0]
        vlm = self._vlm_mlp(vlm_tokens)
        pad = None if vlm_mask is None else ~(vlm_mask.astype(bool))
        goal = self.goal_compressor(vlm, pad)                 # (B, 1, D)
        rgbd = self.rgbd_encoder(input_images, input_depths)  # (B, M*16, D)
        goal_r = jnp.repeat(goal, sample_num, axis=0)
        rgbd_r = jnp.repeat(rgbd, sample_num, axis=0)
        if x_init is None:
            x_init = jax.random.normal(
                rng, (B * sample_num, self.predict_size, 3))
        return self.scheduler.denoise_scan(
            lambda x, t: self.predict_noise(x, t, goal_r, rgbd_r),
            x_init, jax.random.fold_in(rng, 1), noises=step_noises,
        )

    def predict_pointgoal_action_batched(self, vlm_tokens, rng, vlm_mask=None,
                                         sample_num: int = 32, x_init=None,
                                         step_noises=None):
        """Sync batched path: vlm_tokens (B, L, D_vlm) →
        (B*sample_num, P, 3)."""
        B = vlm_tokens.shape[0]
        vlm = self._vlm_mlp(vlm_tokens)
        goal = jnp.mean(vlm, axis=1, keepdims=True)           # (B, 1, D)
        goal_r = jnp.repeat(goal, sample_num, axis=0)
        if x_init is None:
            x_init = jax.random.normal(
                rng, (B * sample_num, self.predict_size, 3))
        return self.scheduler.denoise_scan(
            lambda x, t: self.predict_noise(x, t, goal_r, None),
            x_init, jax.random.fold_in(rng, 1), noises=step_noises,
        )
