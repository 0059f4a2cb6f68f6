"""InternVLA-N1 dual-system model (Flax).

Parity target: reference internnav/model/basemodel/internvla_n1/
internvla_n1.py (InternVLAN1ForCausalLM / InternVLAN1Model:1-441) +
internvla_n1_arch.py (MemoryEncoder:76, QFormer:97, latent_queries,
cond_projector, action en/decoder):

- System-2: Qwen2.5-VL (qwen_text + qwen_vision here) with latent `traj`
  query tokens (TRAJ_TOKEN_INDEX) scattered into the input embedding
  (:166-172) and image tokens scattered at IMAGE_TOKEN_INDEX positions;
- `generate_latents` (:320-347): after decoding, one extra prefill with
  the traj-query embeddings appended; returns those positions' last-layer
  hidden states;
- `generate_traj` (:349-441): System-1 denoise — NextDiT flow-matching
  Euler loop with CFG (latents [+ memory tokens from DepthAnything ViT-S +
  MemoryEncoder + QFormer in the async variant]), or the embedded NavDP
  DDPM head;
- training forward (:234-303): flow-matching velocity MSE (nextdit) or
  DDPM ε MSE (navdp) over traj_hidden_states-conditioned trajectories.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.basemodel.internvla_n1.navdp_head import NavDPHead
from internnav_tpu.model.basemodel.internvla_n1.nextdit import NextDiT, NextDiTConfig
from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    greedy_generate,
)
from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
    QwenVisionConfig,
    QwenVisionTower,
)
from internnav_tpu.model.encoder.transformer import TransformerEncoderLayer
from internnav_tpu.model.encoder.vit import DinoViT
from internnav_tpu.ops.schedulers import FlowMatchEulerScheduler

# token ids (Qwen2.5-VL vocab + reference traj token, internvla_n1.py)
IMAGE_TOKEN_INDEX = 151655
TRAJ_TOKEN_INDEX = 151667
LATENT_EMB_SIZE = 768


@dataclasses.dataclass(frozen=True)
class InternVLAN1Config:
    text: QwenTextConfig = dataclasses.field(default_factory=QwenTextConfig)
    vision: QwenVisionConfig = dataclasses.field(default_factory=QwenVisionConfig)
    system1: str = "nextdit_async"  # nextdit | nextdit_async | navdp_async
    n_query: int = 4
    traj_token_index: int = TRAJ_TOKEN_INDEX
    image_token_index: int = IMAGE_TOKEN_INDEX
    num_history: int = 8
    predict_step_nums: int = 32
    #: System-1 frame resolution the DinoViT / NavDP pos embeds are built
    #: for. None (tiny/test configs) = follow the init-time image_hw
    #: argument. The flagship sets 224: the reference agent resizes every
    #: S1 memory/current frame to 224x224 before the head (reference
    #: internvla_n1_agent.py:310-319), and converted checkpoints carry
    #: 224-resolution pos embeds (257 tokens at patch 14).
    s1_image_hw: Optional[int] = None

    @classmethod
    def tiny(cls, system1: str = "nextdit_async") -> "InternVLAN1Config":
        tc = QwenTextConfig.tiny()
        # compact special ids at the top of the tiny vocab (matches
        # SimpleTokenizer's tiny-vocab layout)
        n_special = 6
        base = tc.vocab_size - n_special
        return cls(text=tc, vision=QwenVisionConfig.tiny(),
                   system1=system1, n_query=2, predict_step_nums=8,
                   image_token_index=base + 4, traj_token_index=base + 5)

    @classmethod
    def qwen25vl_7b(cls, system1: str = "nextdit_async",
                    weight_dtype: str = "bf16",
                    kv_dtype: str = "bf16",
                    remat: bool = False,
                    num_hidden_layers: int = None) -> "InternVLAN1Config":
        """The flagship deployment config: true Qwen2.5-VL-7B dims (the
        QwenTextConfig/QwenVisionConfig defaults), bf16 activations;
        weight_dtype='int8' selects the W8A8-resident serving format;
        kv_dtype='int8' stores the decode KV cache quantized (halves its
        HBM footprint and read traffic — see QwenTextConfig.kv_dtype);
        remat=True rematerializes decoder layers in backward (training);
        num_hidden_layers overrides the 28-layer depth (single-chip
        training benchmarks)."""
        import jax.numpy as jnp

        kw = {} if num_hidden_layers is None else {
            "num_hidden_layers": num_hidden_layers}
        return cls(text=QwenTextConfig(dtype=jnp.bfloat16,
                                       weight_dtype=weight_dtype,
                                       kv_dtype=kv_dtype,
                                       remat=remat, **kw),
                   vision=QwenVisionConfig(dtype=jnp.bfloat16),
                   system1=system1, s1_image_hw=224)


class MemoryEncoder(nn.Module):
    """3-layer post-norm transformer over 384-d image features
    (internvla_n1_arch.py:76-95). The reference builds torch
    TransformerEncoderLayer with DEFAULTS: dim_feedforward=2048,
    activation=relu, norm_first=False, max_len=512 — all of which this
    module matches for checkpoint-conversion parity."""

    hidden_size: int = 384
    num_heads: int = 6
    num_layers: int = 3
    max_len: int = 512
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, memory, memory_mask=None):
        pos = self.param("memory_pos", nn.initializers.normal(1.0),
                         (self.max_len, self.hidden_size))
        x = memory + pos[None, : memory.shape[1]]
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(self.hidden_size, self.num_heads,
                                        dim_feedforward=self.dim_feedforward,
                                        norm_first=False, activation="relu",
                                        name=f"layer_{i}")(
                x, key_padding_mask=memory_mask)
        return x


class QFormer(nn.Module):
    """num_query learned queries cross-attending visual features
    (internvla_n1_arch.py:97-118). The reference's torch
    TransformerDecoder uses DEFAULTS — POST-norm, relu, ff 2048 — matched
    here via the post-norm FormerDecoder (its unused `visual_proj` layer
    is intentionally not reproduced; the reference never calls it)."""

    num_query: int = 32
    hidden_size: int = 768
    num_layers: int = 3
    num_heads: int = 12
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, visual_feats, visual_mask=None):
        from internnav_tpu.model.encoder.navdp_backbone import FormerDecoder

        B = visual_feats.shape[0]
        q = self.param("query_tokens", nn.initializers.normal(1.0),
                       (self.num_query, self.hidden_size))
        qp = self.param("query_pos", nn.initializers.normal(1.0),
                        (self.num_query, self.hidden_size))
        x = jnp.broadcast_to((q + qp)[None], (B, self.num_query, self.hidden_size))
        # the reference never passes a visual mask (generate_traj calls the
        # resampler mask-free, internvla_n1.py:379)
        assert visual_mask is None, "QFormer visual masking is unused upstream"
        return FormerDecoder(self.hidden_size, self.num_heads,
                             self.num_layers,
                             dim_feedforward=self.dim_feedforward,
                             name="decoder")(x, visual_feats)


class InternVLAN1Model(nn.Module):
    cfg: InternVLAN1Config

    def setup(self):
        c = self.cfg
        self.language_model = QwenTextModel(c.text)
        self.visual = QwenVisionTower(c.vision)
        self.latent_queries = self.param(
            "latent_queries", nn.initializers.normal(1.0),
            (1, c.n_query, c.text.hidden_size),
        )
        if "nextdit" in c.system1:
            dit_cfg = NextDiTConfig(latent_embedding_size=LATENT_EMB_SIZE) \
                if c.text.hidden_size > 512 else NextDiTConfig.tiny()
            self._latent_size = dit_cfg.latent_embedding_size
            self.traj_dit = NextDiT(dit_cfg)
            self._dit_dim = dit_cfg.dim
            self.action_encoder = nn.Dense(dit_cfg.dim)
            self.action_decoder = nn.Dense(3)
            self.cond_projector = [nn.Dense(self._latent_size), nn.Dense(self._latent_size)]
            self.noise_scheduler = FlowMatchEulerScheduler()
            if "async" in c.system1:
                rgb_dim = 384 if c.text.hidden_size > 512 else 32
                self._rgb_dim = rgb_dim
                self.rgb_model = DinoViT(dim=rgb_dim, depth=12 if rgb_dim == 384 else 2,
                                         heads=6 if rgb_dim == 384 else 4)
                self.memory_encoder = MemoryEncoder(hidden_size=rgb_dim,
                                                    num_heads=6 if rgb_dim == 384 else 4)
                self.rgb_resampler = QFormer(hidden_size=self._latent_size,
                                             num_heads=12 if rgb_dim == 384 else 4)
                # The reference feeds concat(feats, encoded) — 2*rgb_dim
                # wide — STRAIGHT into the QFormer (internvla_n1.py:379;
                # 384+384 == 768 == QFormer width). A projection here would
                # be an extra layer with no checkpoint counterpart, so it
                # exists ONLY for tiny test configs whose dims don't line
                # up (2*32 != 48).
                if 2 * rgb_dim != self._latent_size:
                    self.memory_proj = nn.Dense(self._latent_size)
                else:
                    self.memory_proj = lambda x: x
        elif "navdp" in c.system1:
            if c.text.hidden_size > 512:
                self.navdp = NavDPHead(memory_size=2, vlm_token_dim=c.text.hidden_size)
            else:
                self.navdp = NavDPHead(memory_size=2, predict_size=8, temporal_depth=2,
                                       token_dim=32, heads=4,
                                       vlm_token_dim=c.text.hidden_size)
        else:
            raise ValueError(c.system1)

    # --------------------------------------------------------------- embeds
    def embed_multimodal(self, input_ids, image_embeds=None):
        """Token embedding with image + traj-query scatter (reference
        internvla_n1.py:166-172). input_ids (B, T); image_embeds (N_img, D)
        in reading order across the batch."""
        c = self.cfg
        embeds = self.language_model.embed(jnp.where(
            input_ids >= c.text.vocab_size, 0, input_ids
        ))
        B, T, D = embeds.shape
        if image_embeds is not None:
            img_mask = (input_ids == c.image_token_index).reshape(-1)
            flat = embeds.reshape(B * T, D)
            # scatter image embeds into image-token slots in order
            idx = jnp.cumsum(img_mask) - 1
            gathered = image_embeds[jnp.clip(idx, 0, image_embeds.shape[0] - 1)]
            flat = jnp.where(img_mask[:, None], gathered.astype(flat.dtype), flat)
            embeds = flat.reshape(B, T, D)
        # traj-query scatter
        traj_mask = input_ids == c.traj_token_index
        n_q = c.n_query
        q = self.latent_queries[0]  # (n_query, D)
        pos_in_run = jnp.where(
            traj_mask,
            (jnp.cumsum(traj_mask, axis=1) - 1) % n_q,
            0,
        )
        q_embeds = q[pos_in_run]
        embeds = jnp.where(traj_mask[..., None], q_embeds.astype(embeds.dtype), embeds)
        return embeds

    def encode_vision(self, patches, cos, sin, window_segments, full_segments,
                      window_index, reverse_index, window_block: int = 0,
                      full_block: int = 0):
        return self.visual(patches, cos, sin, window_segments, full_segments,
                           window_index, reverse_index,
                           window_block=window_block, full_block=full_block)

    def traj_queries(self):
        """The learned latent query embeddings (1, n_query, D)."""
        return self.latent_queries

    def prefill(self, inputs_embeds, position_ids, segment_ids=None,
                return_cache=False, compute_logits: bool = True):
        return self.language_model(inputs_embeds, position_ids,
                                   segment_ids=segment_ids,
                                   return_cache=return_cache,
                                   compute_logits=compute_logits)

    # ------------------------------------------------------------ system-1
    def _project_latents(self, traj_latents):
        x = self.cond_projector[0](traj_latents)
        x = nn.gelu(x, approximate=True)
        return self.cond_projector[1](x)

    def rgb_feats(self, images):
        """DINOv2 patch features for a stack of ImageNet-normalized frames:
        (N, H, W, 3) → (N, P, rgb_dim). Split out so serving can cache the
        memory frame's features across System-1 calls (the reference
        re-encodes both frames every call, internvla_n1.py:365-379)."""
        # compute dtype follows the text trunk (bf16 deployment parity);
        # with bf16 params the DINOv2 tower then runs at the MXU bf16 rate
        # instead of promoting everything to fp32
        return self.rgb_model(images.astype(self.cfg.text.dtype))

    def memory_tokens_from_feats(self, feats):
        """(B, S*P, rgb_dim) concatenated per-frame DINOv2 features →
        (B, 32, latent) QFormer tokens (internvla_n1.py:236-255)."""
        mem = self.memory_encoder(feats)
        mem = jnp.concatenate([feats, mem], axis=-1)
        mem = self.memory_proj(mem)
        return self.rgb_resampler(mem)

    def memory_tokens_from_images(self, images_dp):
        """images_dp: (B, 2, H, W, 3) [pixel-goal frame, current frame],
        ImageNet-normalized. → (B, 32, latent) QFormer tokens
        (internvla_n1.py:236-255)."""
        B, S = images_dp.shape[:2]
        flat = images_dp.reshape((-1,) + images_dp.shape[2:])
        feats = self.rgb_feats(flat)  # (B*S, P, rgb_dim)
        feats = feats.reshape(B, -1, feats.shape[-1])  # (B, S*P, rgb_dim)
        return self.memory_tokens_from_feats(feats)

    def nextdit_velocity(self, noisy_traj, timestep, z_latents,
                         num_samples: int = 1):
        """action features → DiT → decoded velocity.
        noisy_traj (B*num_samples, T, 3); timestep (B,); z_latents (B, L, E)
        — sample i*num_samples+j conditions on batch row i."""
        feats = self.action_encoder(noisy_traj)
        T = feats.shape[1]
        pos = _sin_pos_encoding(jnp.arange(T), feats.shape[-1])
        feats = feats + pos[None]
        out = self.traj_dit(feats, timestep, z_latents,
                            num_samples=num_samples)
        return self.action_decoder(out)

    def generate_traj_nextdit(self, traj_latents, images_dp=None, *,
                              rng=None, guidance_scale: float = 1.0,
                              num_inference_steps: int = 10,
                              num_sample_trajs: int = 32,
                              predict_step_nums: Optional[int] = None,
                              x_init=None):
        """Flow-matching Euler denoise with CFG (internvla_n1.py:349-441)."""
        c = self.cfg
        P = predict_step_nums or c.predict_step_nums
        lat = self._project_latents(traj_latents)  # (B, n_query, latent)
        if "async" in c.system1 and images_dp is not None:
            mem = self.memory_tokens_from_images(images_dp)
            hidden = jnp.concatenate([mem, lat], axis=1)
        else:
            hidden = lat
        return self._denoise_hidden(hidden, rng, guidance_scale,
                                    num_inference_steps, num_sample_trajs, P,
                                    x_init=x_init)

    def generate_traj_nextdit_cached(self, traj_latents, mem_feats,
                                     current_images, *, rng=None,
                                     guidance_scale: float = 1.0,
                                     num_inference_steps: int = 10,
                                     num_sample_trajs: int = 32,
                                     predict_step_nums: Optional[int] = None,
                                     x_init=None):
        """generate_traj_nextdit with the memory frame's DINOv2 features
        precomputed (`rgb_feats`): only the current frame is encoded here.
        Mathematically identical to passing both frames as pixels — the two
        towers' features are concatenated either way. Serving caches
        mem_feats on device across the ≤sys2_max_forward_step System-1
        calls that share one S2 latent, so each call uploads and encodes
        exactly one new frame per stream."""
        c = self.cfg
        P = predict_step_nums or c.predict_step_nums
        lat = self._project_latents(traj_latents)
        if "async" in c.system1:
            cur = self.rgb_feats(current_images)
            feats = jnp.concatenate([mem_feats, cur], axis=1)
            mem = self.memory_tokens_from_feats(feats)
            hidden = jnp.concatenate([mem, lat], axis=1)
        else:
            hidden = lat  # non-async nextdit conditions on latents only
        return self._denoise_hidden(hidden, rng, guidance_scale,
                                    num_inference_steps, num_sample_trajs, P,
                                    x_init=x_init)

    def _denoise_hidden(self, hidden, rng, guidance_scale,
                        num_inference_steps, num_sample_trajs, P,
                        x_init=None):
        B = hidden.shape[0]
        if x_init is None:
            x_init = jax.random.normal(rng, (B * num_sample_trajs, P, 3))
        # x_init injection exists for GROUPED serving: one program denoises
        # several cohorts' rows, but each cohort's noise must equal the draw
        # its own per-cohort program would have made (per-cohort keys, one
        # normal per cohort block) so grouped results stay row-identical.

        if guidance_scale == 1.0:
            # The reference always denoises with its default
            # guidance_scale=1.0 (internvla_n1.py:355; no caller overrides
            # it), where u + 1.0*(c - u) == c exactly: the unconditional
            # branch is dead compute. Run the conditional branch only —
            # halves the DiT batch with output equal up to float epsilon.
            # Conditioning stays at batch B (num_samples folding): the
            # caption projection, temb and cross K/V aren't recomputed per
            # diffusion sample.
            def velocity(x, t):
                return self.nextdit_velocity(
                    x, jnp.broadcast_to(t, (B,)), hidden,
                    num_samples=num_sample_trajs)
        else:
            null = jnp.zeros_like(hidden)
            cond2 = jnp.concatenate([null, hidden], axis=0)

            def velocity(x, t):
                x2 = jnp.concatenate([x, x], axis=0)
                v = self.nextdit_velocity(
                    x2, jnp.broadcast_to(t, (2 * B,)), cond2,
                    num_samples=num_sample_trajs)
                v_u, v_c = v[: x.shape[0]], v[x.shape[0]:]
                return v_u + guidance_scale * (v_c - v_u)

        return self.noise_scheduler.denoise_scan(velocity, x_init, num_inference_steps)

    def generate_traj_navdp(self, traj_latents, images_dp=None, depths_dp=None, *,
                            rng, sample_num: int = 32, vlm_mask=None):
        if "async" in self.cfg.system1:
            return self.navdp.predict_pointgoal_action_async(
                traj_latents, images_dp, depths_dp, rng, vlm_mask=vlm_mask,
                sample_num=sample_num,
            )
        return self.navdp.predict_pointgoal_action(
            traj_latents, rng, vlm_mask=vlm_mask, sample_num=sample_num
        )

    def generate_traj_navdp_batched(self, traj_latents, images_dp=None,
                                    depths_dp=None, *, rng,
                                    sample_num: int = 32, vlm_mask=None,
                                    x_init=None, step_noises=None):
        """Batched NavDP System-1: B episode streams through one denoise
        program. traj_latents (B, L, D); images/depths (B, M, H, W, C) for
        the async variant. → (B*sample_num, P, 3), row block i conditioned
        on stream i (see navdp_head batched-inference notes)."""
        if "async" in self.cfg.system1:
            return self.navdp.predict_pointgoal_action_async_batched(
                traj_latents, images_dp, depths_dp, rng, vlm_mask=vlm_mask,
                sample_num=sample_num, x_init=x_init, step_noises=step_noises,
            )
        return self.navdp.predict_pointgoal_action_batched(
            traj_latents, rng, vlm_mask=vlm_mask, sample_num=sample_num,
            x_init=x_init, step_noises=step_noises,
        )

    # ------------------------------------------------------------- training
    def traj_loss_nextdit(self, traj_hidden_states, traj_poses, rng,
                          images_dp=None, loss_mask=None):
        """Flow-matching velocity MSE (internvla_n1.py:260-286).
        traj_hidden_states (B, n_query, D_text); traj_poses (B, P, 3)."""
        lat = self._project_latents(traj_hidden_states)
        if "async" in self.cfg.system1 and images_dp is not None:
            mem = self.memory_tokens_from_images(images_dp)
            lat = jnp.concatenate([mem, lat], axis=1)
        B = traj_poses.shape[0]
        r_t, r_n = jax.random.split(rng)
        u = jax.random.uniform(r_t, (B,))
        t = (u * self.noise_scheduler.num_train_timesteps).astype(jnp.int32)
        noise = jax.random.normal(r_n, traj_poses.shape)
        noisy = self.noise_scheduler.add_noise(traj_poses, noise, t)
        v_pred = self.nextdit_velocity(noisy, t.astype(jnp.float32), lat)
        target = self.noise_scheduler.velocity_target(traj_poses, noise)
        mse = (v_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        if loss_mask is not None:
            w = loss_mask.reshape(B, 1, 1).astype(jnp.float32)
            return (mse * w).sum() / jnp.maximum(w.sum(), 1e-6) / (mse.shape[1] * mse.shape[2])
        return mse.mean()


def _sin_pos_encoding(positions, dim):
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = positions.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
