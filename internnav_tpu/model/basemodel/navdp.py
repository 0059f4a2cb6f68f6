"""NavDP — goal-conditioned diffusion policy for visual navigation (Flax).

Parity target: reference internnav/model/basemodel/navdp/navdp_policy.py
(NavDPNet:34, forward:187-273, predict_noise:159, predict_critic:172,
predict_pointgoal_batch_action_vel:302, predict_nogoal:323):

- RGBD memory tokens from two ViT-S towers (memory_size frames);
- goal encoders: point (linear on xyz), image (6-ch ViT), pixel (7-ch ViT);
- denoiser: temporal_depth-layer pre-norm transformer decoder; condition =
  [time, goal, goal, goal, rgbd-memory] with learned cond PE; causal
  tgt mask over predict_size waypoints; DDPM T=10, epsilon, clip;
- critic: same decoder, goal slots masked out of the memory
  (cond_critic_mask), mean-pooled → scalar; ranks 32 sampled trajectories;
- training draws per-sample goal-type combos by batch-index pattern
  (i % 27 → base-3 digits) and supervises nogoal + multigoal diffusion,
  critic on label vs augmented trajectories, image/pixel aux heads.

TPU-first: inference denoising is one lax.scan over scheduler steps with
the 32-sample batch fused in (the throughput-critical loop, SURVEY.md §7);
critic ranking via jax.lax.top_k.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.encoder.navdp_backbone import (
    ImageGoalBackbone,
    PixelGoalBackbone,
    RGBDBackbone,
)
from internnav_tpu.model.encoder.transformer import SinusoidalPosEmb


def _ref_navdp_tgt_mask(P: int):
    """The standalone reference NavDP passes its BOOL tgt_mask straight to
    torch (navdp_policy.py:122,166): torch bool masks mean True = BLOCKED,
    so the lower-triangle-True matrix actually lets waypoint i attend only
    STRICTLY FUTURE waypoints (and SDPA zeroes the fully-blocked last row).
    The N1-embedded variant converts the same matrix to a float mask
    (navdp.py:82-88), which IS standard causal — navdp_head.py keeps that.
    We reproduce each variant's actual behavior. True = keep here."""
    import jax.numpy as jnp

    return jnp.arange(P)[None, :] > jnp.arange(P)[:, None]
from internnav_tpu.model.encoder.navdp_backbone import FormerDecoder
from internnav_tpu.ops.schedulers import DDPMScheduler


class NavDPNet(nn.Module):
    cfg: ModelCfg

    def setup(self):
        c = self.cfg
        self.memory_size = getattr(c, "memory_size", 8)
        self.predict_size = getattr(c, "predict_size", 24)
        self.token_dim = getattr(c, "token_dim", 384)
        self.temporal_depth = getattr(c, "temporal_depth", 8)
        self.heads = getattr(c, "heads", 8)
        D = self.token_dim
        self.rgbd_encoder = RGBDBackbone(
            embed_size=D, memory_size=self.memory_size, token_dim=384
        )
        self.pixel_encoder = PixelGoalBackbone(embed_size=D)
        self.image_encoder = ImageGoalBackbone(embed_size=D)
        self.point_encoder = nn.Dense(D)
        self.decoder = FormerDecoder(D, self.heads, self.temporal_depth, norm_first=True)
        self.input_embed = nn.Dense(D)
        self.cond_pos_embed = nn.Embed(self.memory_size * 16 + 4, D)
        self.out_pos_embed = nn.Embed(self.predict_size, D)
        self.time_emb = SinusoidalPosEmb(D)
        self.final_ln = nn.LayerNorm()
        self.action_head = nn.Dense(3)
        self.critic_head = nn.Dense(1)
        self.pixel_aux_head = nn.Dense(3)
        self.image_aux_head = nn.Dense(3)
        self.scheduler = DDPMScheduler(
            num_train_timesteps=10, beta_schedule="squaredcos_cap_v2",
            clip_sample=True, prediction_type="epsilon",
        )

    # -------------------------------------------------------------- helpers
    def _cond(self, time_embeds, goal_embed, rgbd_embed):
        """[time(1), goal x3, rgbd(memory*16)] + learned cond PE."""
        cond = jnp.concatenate(
            [time_embeds, goal_embed, goal_embed, goal_embed, rgbd_embed], axis=1
        )
        pe = self.cond_pos_embed(jnp.arange(cond.shape[1]))
        return cond + pe[None]

    def predict_noise(self, noisy_actions, t, goal_embed, rgbd_embed):
        """noisy_actions: (B, P, 3); t scalar or (B,)."""
        B = noisy_actions.shape[0]
        time_embeds = self.time_emb(jnp.broadcast_to(jnp.asarray(t).reshape(-1), (B,)))[:, None]
        cond = self._cond(time_embeds, goal_embed, rgbd_embed)
        x = self.input_embed(noisy_actions)
        x = x + self.out_pos_embed(jnp.arange(x.shape[1]))[None]
        out = self.decoder(x, cond, tgt_mask=_ref_navdp_tgt_mask(self.predict_size))
        out = self.final_ln(out)
        return self.action_head(out)

    def predict_critic(self, trajectories, rgbd_embed):
        """trajectories: (B, P, 3) in action units → (B,) critic values.
        Goal slots (first 4 cond tokens) are masked out (cond_critic_mask)."""
        B = trajectories.shape[0]
        zero_goal = jnp.zeros((B, 1, self.token_dim), rgbd_embed.dtype)
        time_slot = jnp.zeros((B, 1, self.token_dim), rgbd_embed.dtype)
        cond = self._cond(time_slot, zero_goal, rgbd_embed)
        x = self.input_embed(trajectories)
        x = x + self.out_pos_embed(jnp.arange(x.shape[1]))[None]
        Tc = cond.shape[1]
        mem_mask = jnp.concatenate(
            [jnp.zeros((self.predict_size, 4), bool),
             jnp.ones((self.predict_size, Tc - 4), bool)], axis=1
        )
        out = self.decoder(x, cond, memory_mask=mem_mask)
        out = self.final_ln(out)
        return self.critic_head(out.mean(axis=1))[:, 0]

    # ------------------------------------------------------------- training
    def __call__(self, goal_point, goal_image, goal_pixel, input_images,
                 input_depths, output_actions, augment_actions, rng):
        """Training forward (reference navdp_policy.py:187-273). Returns
        (eps_pred_ng, eps_pred_mg, critic_label, critic_augment, ng_noise,
        mg_noise, image_aux, pixel_aux)."""
        B = output_actions.shape[0]
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        rgbd_embed = self.rgbd_encoder(input_images, input_depths)
        point_embed = self.point_encoder(goal_point)[:, None]
        nogoal = jnp.zeros_like(point_embed)
        image_embed = self.image_encoder(goal_image)[:, None]
        pixel_embed = self.pixel_encoder(goal_pixel)[:, None]

        image_aux = self.image_aux_head(image_embed[:, 0])
        pixel_aux = self.pixel_aux_head(pixel_embed[:, 0])

        def sample_noise(r):
            t = jax.random.randint(r, (B,), 0, self.scheduler.num_train_timesteps)
            noise = jax.random.normal(jax.random.fold_in(r, 1), output_actions.shape)
            noisy = self.scheduler.add_noise(output_actions, noise, t)
            return t, noise, noisy

        ng_t, ng_noise, ng_noisy = sample_noise(r1)
        mg_t, mg_noise, mg_noisy = sample_noise(r2)

        # multigoal: per-sample base-3 goal pattern (navdp_policy.py:219-235)
        idx = jnp.arange(B) % 27
        goals = jnp.stack([point_embed, image_embed, pixel_embed], axis=0)  # (3, B, 1, D)
        pick = lambda sel: jnp.take_along_axis(
            goals, sel.reshape(1, B, 1, 1), axis=0
        )[0]
        g0 = pick(idx % 3)
        g1 = pick((idx // 3) % 3)
        g2 = pick((idx // 9) % 3)

        def denoise_pred(noisy, t, g_a, g_b, g_c):
            time_embeds = self.time_emb(t)[:, None]
            cond = jnp.concatenate([time_embeds, g_a, g_b, g_c, rgbd_embed], axis=1)
            cond = cond + self.cond_pos_embed(jnp.arange(cond.shape[1]))[None]
            x = self.input_embed(noisy)
            x = x + self.out_pos_embed(jnp.arange(x.shape[1]))[None]
            out = self.decoder(x, cond, tgt_mask=_ref_navdp_tgt_mask(self.predict_size))
            return self.action_head(self.final_ln(out))

        eps_ng = denoise_pred(ng_noisy, ng_t, nogoal, nogoal, nogoal)
        eps_mg = denoise_pred(mg_noisy, mg_t, g0, g1, g2)

        critic_label = self.predict_critic(jax.lax.stop_gradient(output_actions), rgbd_embed)
        critic_augment = self.predict_critic(jax.lax.stop_gradient(augment_actions), rgbd_embed)
        return (eps_ng, eps_mg, critic_label, critic_augment, ng_noise, mg_noise,
                image_aux, pixel_aux)

    # ------------------------------------------------------------ inference
    def _denoise_and_rank(self, goal_embed, rgbd_embed, rng, sample_num: int,
                          topk: int = 8):
        B = rgbd_embed.shape[0]
        S = sample_num * B
        goal_rep = jnp.repeat(goal_embed, sample_num, axis=0)
        rgbd_rep = jnp.repeat(rgbd_embed, sample_num, axis=0)
        x_init = jax.random.normal(rng, (S, self.predict_size, 3))

        def predict_eps(x, t):
            return self.predict_noise(x, t, goal_rep, rgbd_rep)

        naction = self.scheduler.denoise_scan(
            predict_eps, x_init, jax.random.fold_in(rng, 1)
        )
        critic = self.predict_critic(naction, rgbd_rep)  # (S,)
        trajs = jnp.cumsum(naction / 4.0, axis=1)  # velocity integration (:317)
        critic = critic.reshape(B, sample_num)
        trajs = trajs.reshape(B, sample_num, self.predict_size, 3)
        topk = min(topk, sample_num)
        _, best = jax.lax.top_k(critic, topk)
        _, worst = jax.lax.top_k(-critic, topk)
        take = lambda ind: jnp.take_along_axis(
            trajs, ind[..., None, None], axis=1
        )
        return take(worst), take(best)  # (negative, positive) like reference

    def predict_pointgoal(self, goal_point, input_images, input_depths, rng,
                          sample_num: int = 32):
        rgbd_embed = self.rgbd_encoder(input_images, input_depths)
        goal_embed = self.point_encoder(goal_point)[:, None]
        return self._denoise_and_rank(goal_embed, rgbd_embed, rng, sample_num)

    def predict_nogoal(self, input_images, input_depths, rng, sample_num: int = 32):
        rgbd_embed = self.rgbd_encoder(input_images, input_depths)
        goal_embed = jnp.zeros_like(rgbd_embed[:, :1])
        return self._denoise_and_rank(goal_embed, rgbd_embed, rng, sample_num)

    def predict_imagegoal(self, goal_image, input_images, input_depths, rng,
                          sample_num: int = 32):
        rgbd_embed = self.rgbd_encoder(input_images, input_depths)
        goal_embed = self.image_encoder(goal_image)[:, None]
        return self._denoise_and_rank(goal_embed, rgbd_embed, rng, sample_num)

    def predict_pixelgoal(self, goal_pixel, input_images, input_depths, rng,
                          sample_num: int = 32):
        rgbd_embed = self.rgbd_encoder(input_images, input_depths)
        goal_embed = self.pixel_encoder(goal_pixel)[:, None]
        return self._denoise_and_rank(goal_embed, rgbd_embed, rng, sample_num)


class NavDPPolicy(Policy):
    name = "NavDP_Policy"
    TORCH_CONVERTER_NAME = "convert_navdp_policy"

    @classmethod
    def build(cls, cfg: ModelCfg, rng: Optional[jax.Array] = None,
              image_size: int = 224) -> "NavDPPolicy":
        module = NavDPNet(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        M = getattr(cfg, "memory_size", 8)
        P = getattr(cfg, "predict_size", 24)
        s = image_size
        params = module.init(
            rng,
            jnp.zeros((1, 3)), jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 7)),
            jnp.zeros((1, M, s, s, 3)), jnp.zeros((1, M, s, s, 1)),
            jnp.zeros((1, P, 3)), jnp.zeros((1, P, 3)), jax.random.PRNGKey(1),
        )["params"]
        return cls(module, params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[ModelCfg] = None) -> "NavDPPolicy":
        cfg = cls.load_config(path, default=cfg)
        pol = cls.build(cfg)
        pol.params = cls.load_params_file(path, pol.params)
        return pol

    def forward(self, batch: Dict[str, Any]):
        mode = batch.get("mode", "train")
        rng = batch.get("rng", jax.random.PRNGKey(0))
        if mode == "train":
            fn = self.jit_apply("train", lambda: jax.jit(
                lambda p, *a: self.module.apply({"params": p}, *a)
            ))
            o = batch["observations"]
            return fn(self.params, o["goal_point"], o["goal_image"], o["goal_pixel"],
                      o["input_images"], o["input_depths"], o["output_actions"],
                      o["augment_actions"], rng)
        method = {
            "pointgoal": NavDPNet.predict_pointgoal,
            "nogoal": NavDPNet.predict_nogoal,
            "imagegoal": NavDPNet.predict_imagegoal,
            "pixelgoal": NavDPNet.predict_pixelgoal,
        }[mode]
        sample_num = batch.get("sample_num", 32)
        o = batch["observations"]
        goal_key = {"pointgoal": "goal_point", "imagegoal": "goal_image",
                    "pixelgoal": "goal_pixel", "nogoal": None}[mode]
        args = (() if goal_key is None else (o[goal_key],)) + (
            o["input_images"], o["input_depths"])

        def builder():
            def f(params, rng_, *a):
                return self.module.apply({"params": params}, *a, rng_, sample_num,
                                         method=method)
            return jax.jit(f)

        fn = self.jit_apply(f"infer_{mode}_{sample_num}", builder)
        return fn(self.params, rng, *args)
