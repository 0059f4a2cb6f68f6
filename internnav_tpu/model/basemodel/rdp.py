"""RDP — continuous-action diffusion-policy VLN (Flax, TPU-native).

Parity target: reference internnav/model/basemodel/rdp/rdp_policy.py
(RDPNet.__init__:116-297, denoise_actions:318-362, pred_actions:364,
update_rnn_states:683, forward:985) with the default rdp_cfg dims
(configs/model/rdp.py): RoBERTa-style text encoder (512), CLIP RGB +
DD-PPO depth fused to 5 tokens (512), GRU 512, 3-layer/512 diffusion
transformer over 8 waypoints x (dx, dy, dyaw), DDPM T=20 with
classifier-free guidance (scale 1.5, token masking of text/rgb), progress
+ stop-progress sigmoid heads on [state; txt_cls].

TPU-first: the entire denoise loop (20 steps x CFG-doubled batch) compiles
into one lax.scan inside a single jit — the reference round-trips the
python loop through the scheduler per step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.encoder.bert import LanguageEncoder, VisionLanguageEncoder
from internnav_tpu.model.encoder.clip_vit import CLIPImageEncoder
from internnav_tpu.model.encoder.diffusion_transformer import (
    DistanceNetwork,
    TransformerForDiffusion,
)
from internnav_tpu.model.encoder.rnn_state import RNNStateEncoder
from internnav_tpu.ops.schedulers import DDPMScheduler


class RDPNet(nn.Module):
    cfg: ModelCfg

    @property
    def num_actions(self) -> int:
        return 3 if self.cfg.learn_angle else 2

    def setup(self):
        c = self.cfg
        dp = c.diffusion_policy
        H = c.state_encoder.hidden_size  # 512
        if getattr(c.text_encoder, "model_name", "") == "clip-long":
            # the shipped rdp_cfg text path (configs/model/rdp.py:30)
            from internnav_tpu.model.encoder.longclip import LongCLIPTextEncoder

            self.instruction_encoder = LongCLIPTextEncoder(
                vocab_size=c.text_encoder.vocab_size,
                width=H,
                layers=c.text_encoder.num_l_layers,
                heads=getattr(c.text_encoder, "num_heads", 8),
                context_length=getattr(c.text_encoder, "max_length", 248),
            )
        else:
            self.instruction_encoder = LanguageEncoder(
                vocab_size=c.text_encoder.vocab_size,
                hidden_size=H,
                num_layers=c.text_encoder.num_l_layers,
                num_heads=8,
                intermediate_size=4 * H,
            )
        self.image_encoder = CLIPImageEncoder(
            projection_dim=H, img_mod=c.image_encoder.rgb.img_mod,
            vit_width=getattr(c, "vit_width", 768),
            vit_layers=getattr(c, "vit_layers", 12),
            vit_heads=getattr(c, "vit_heads", 12),
        )
        na = self.num_actions
        self.prev_action_embedding = nn.Dense(64)
        self.prev_action_embedding_dp = nn.Dense(H)
        self.imu_linear = nn.Dense(64)
        self.imu_linear_dp = nn.Dense(H)

        vis_tokens = 5 if c.image_encoder.rgb.img_mod == "multi_patches_avg_pooling" else 1
        rnn_in = vis_tokens * H + 64 + 64  # flat rgb-depth + prev_act + imu
        self.state_encoder = RNNStateEncoder(input_size=rnn_in, hidden_size=H,
                                             rnn_type=c.state_encoder.rnn_type)
        xm = c.cross_modal_encoder
        self.img_txt_cross_encoder = VisionLanguageEncoder(
            hidden_size=H, num_heads=xm.num_attention_heads if xm else 8,
            num_layers=xm.num_x_layers if xm else 2,
        )
        self.txt_img_cross_encoder = VisionLanguageEncoder(
            hidden_size=H, num_heads=8, num_layers=2,
        )
        self.n_obs_steps = vis_tokens + 1 + 1 + 1 + 1 + c.len_traj_act
        self.action_dp_pred_net = TransformerForDiffusion(
            input_dim=na, output_dim=na,
            horizon=dp.len_traj_pred, n_obs_steps=self.n_obs_steps,
            cond_dim=H, n_emb=dp.n_emb, n_layer=dp.n_layer, n_cond_layers=1,
        )
        self.action_type_embeds = nn.Embed(10, dp.n_emb)
        self.progress_monitor = DistanceNetwork(normalize=True)
        self.stop_progress_predictor = DistanceNetwork(normalize=True)
        # optional distance-to-goal head on the GRU state (reference
        # rdp_policy.py:267-272, 643-647; off in the shipped rdp_cfg)
        if c.distance_predictor is not None and c.distance_predictor.use:
            self.distance_pred_net = DistanceNetwork(
                normalize=c.distance_predictor.normalize)
        else:
            self.distance_pred_net = None
        self.scheduler = DDPMScheduler(
            num_train_timesteps=dp.num_train_timesteps,
            beta_schedule="squaredcos_cap_v2",
            clip_sample=True, prediction_type="epsilon",
        )

    # ----------------------------------------------------------- encoders
    def _encode_step(self, observations, rnn_states, prev_actions, masks):
        """Shared per-step encoding → (state, rnn_out, vis tokens, prev/imu embeds)."""
        prev = prev_actions.astype(jnp.float32) * masks[:, None, None]  # (B, La, na)
        prev_embeds = self.prev_action_embedding(prev)  # (B, La, 64)
        latest_prev = prev_embeds[:, 0]
        rgbd = self.image_encoder(observations["rgb"], observations["depth"])  # (B, 5, H)
        imu = observations.get("imu")
        if imu is None:
            imu = jnp.zeros((rgbd.shape[0], 3), rgbd.dtype)
        imu_emb = self.imu_linear(imu)
        flat_vis = rgbd.reshape(rgbd.shape[0], -1)
        concat = jnp.concatenate([flat_vis, latest_prev, imu_emb], axis=1)
        state, rnn_out = self.state_encoder(concat, rnn_states, masks)
        return state, rnn_out, rgbd, prev, imu

    def update_rnn(self, observations, rnn_states, prev_actions, masks):
        state, rnn_out, *_ = self._encode_step(observations, rnn_states, prev_actions, masks)
        return state, rnn_out

    def _conditioning(self, observations, rnn_states, prev_actions, masks):
        state, rnn_out, rgbd, prev, imu = self._encode_step(
            observations, rnn_states, prev_actions, masks
        )
        txt, txt_valid, _ = self.instruction_encoder(observations["instruction"])
        state_tok = state[:, None]  # (B, 1, H)
        vis_state = jnp.concatenate([rgbd, state_tok], axis=1)  # (B, 6, H)
        img_txt, _ = self.img_txt_cross_encoder(vis_state, txt, None, txt_valid)
        txt_img, _ = self.txt_img_cross_encoder(txt, vis_state, txt_valid, None)

        txt_dp = txt_img[:, :1]  # fused CLS token
        imu_dp = self.imu_linear_dp(imu)[:, None]
        prev_dp = self.prev_action_embedding_dp(prev)  # (B, La, H)
        cond = jnp.concatenate([img_txt, txt_dp, state_tok, imu_dp, prev_dp], axis=1)
        type_ids = np.concatenate([
            np.zeros(img_txt.shape[1]), [1], [2], [4],
            np.full(prev_dp.shape[1], 5),
        ]).astype(np.int32)
        type_embeds = self.action_type_embeds(jnp.asarray(type_ids))[None]
        type_embeds = jnp.broadcast_to(type_embeds, (cond.shape[0],) + type_embeds.shape[1:])

        progress = self.progress_monitor(jnp.concatenate([state, txt_img[:, 0]], axis=1))
        stop_progress = self.stop_progress_predictor(
            jnp.concatenate([state, txt_img[:, 0]], axis=1)
        )
        distance = (self.distance_pred_net(state)
                    if self.distance_pred_net is not None else None)
        n_img = img_txt.shape[1]
        return cond, type_embeds, rnn_out, progress, stop_progress, distance, n_img

    # ------------------------------------------------------------ training
    def train_forward(self, observations, rnn_states, prev_actions, masks, rng):
        """Predict ε on noised gt actions + aux heads. observations['actions']
        are normalized (B, len_traj_pred, na)."""
        cond, type_embeds, rnn_out, progress, stop_progress, distance, n_img = \
            self._conditioning(observations, rnn_states, prev_actions, masks)
        dp = self.cfg.diffusion_policy
        naction = observations["actions"]
        B = naction.shape[0]
        r_t, r_n, r_m = jax.random.split(rng, 3)
        t = jax.random.randint(r_t, (B,), 0, self.scheduler.num_train_timesteps)
        noise = jax.random.normal(r_n, naction.shape)
        noisy = self.scheduler.add_noise(naction, noise, t)

        # CFG token masking during training (mask text+rgb cond tokens with
        # prob cls_mask_ratio; reference rdp_policy.py:612-631)
        mask_rows = jax.random.uniform(r_m, (B,)) < dp.cls_mask_ratio
        tok_is_maskable = np.zeros(1 + cond.shape[1], np.float32)
        tok_is_maskable[1 : 1 + n_img + 1] = 1.0  # img tokens + txt token
        cond_mask = mask_rows[:, None] * jnp.asarray(tok_is_maskable)[None]

        eps_pred = self.action_dp_pred_net(noisy, t, cond, type_embeds, cond_mask)
        return eps_pred, noise, rnn_out, progress, stop_progress, distance

    # ----------------------------------------------------------- inference
    def denoise(self, observations, rnn_states, prev_actions, masks, rng,
                guidance_scale: float = 1.5):
        """Full CFG denoise loop → normalized action trajectory
        (B, len_traj_pred, na); one lax.scan over scheduler steps."""
        cond, type_embeds, rnn_out, progress, stop_progress, distance, n_img = \
            self._conditioning(observations, rnn_states, prev_actions, masks)
        dp = self.cfg.diffusion_policy
        B = cond.shape[0]
        na = self.num_actions
        use_cfg = dp.use_cls_free_guidance

        if use_cfg:
            # conditional rows then fully-masked (null) rows
            null_mask = np.zeros(1 + self.n_obs_steps, np.float32)
            null_mask[1 : 1 + n_img + 1] = 1.0
            cond_mask = jnp.concatenate([
                jnp.zeros((B, 1 + self.n_obs_steps)),
                jnp.broadcast_to(jnp.asarray(null_mask)[None], (B, 1 + self.n_obs_steps)),
            ], axis=0)
            cond2 = jnp.concatenate([cond, cond], axis=0)
            types2 = jnp.concatenate([type_embeds, type_embeds], axis=0)
        else:
            cond_mask, cond2, types2 = None, cond, type_embeds

        x_init = jax.random.normal(rng, (B, dp.len_traj_pred, na))

        def predict_eps(x, t):
            if use_cfg:
                x2 = jnp.concatenate([x, x], axis=0)
                eps = self.action_dp_pred_net(x2, jnp.broadcast_to(t, (2 * B,)),
                                              cond2, types2, cond_mask)
                eps_c, eps_u = eps[:B], eps[B:]
                guided = eps_u + guidance_scale * (eps_c - eps_u)
                # the reference applies guidance only for k != 0
                # (rdp_policy.py:344-350): the final step uses the
                # conditional prediction alone
                return jnp.where(t != 0, guided, eps_c)
            return self.action_dp_pred_net(x, jnp.broadcast_to(t, (B,)),
                                           cond2, types2, cond_mask)

        traj = self.scheduler.denoise_scan(predict_eps, x_init,
                                           jax.random.fold_in(rng, 1))
        return traj, rnn_out, progress, stop_progress, distance

    def __call__(self, observations, rnn_states, prev_actions, masks,
                 mode: str = "update_rnn", rng: Optional[jax.Array] = None):
        if mode == "update_rnn":
            return self.update_rnn(observations, rnn_states, prev_actions, masks)
        if mode == "train":
            return self.train_forward(observations, rnn_states, prev_actions, masks, rng)
        if mode == "act":
            return self.denoise(observations, rnn_states, prev_actions, masks, rng,
                                guidance_scale=self.cfg.diffusion_policy.cls_free_guidance_scale)
        raise ValueError(mode)


class RDPPolicy(Policy):
    name = "RDP_Policy"
    TORCH_CONVERTER_NAME = "convert_rdp_policy"

    ACTION_STATS = {"min": np.asarray([-0.25, -0.25, -0.27]),
                    "max": np.asarray([0.25, 0.25, 0.27])}

    @classmethod
    def build(cls, cfg: ModelCfg, rng: Optional[jax.Array] = None) -> "RDPPolicy":
        module = RDPNet(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        obs = cls._dummy_obs(cfg, 1)
        params = module.init(
            rng, obs, jnp.zeros((1, 1, cfg.state_encoder.hidden_size)),
            jnp.zeros((1, cfg.len_traj_act, 3)), jnp.ones((1,)),
            mode="train", rng=jax.random.PRNGKey(1),
        )["params"]
        return cls(module, params, cfg)

    @staticmethod
    def _dummy_obs(cfg: ModelCfg, n: int) -> Dict[str, jnp.ndarray]:
        return {
            "instruction": jnp.ones((n, 16), jnp.int32) * 2,
            "rgb": jnp.zeros((n, 224, 224, 3), jnp.float32),
            "depth": jnp.zeros((n, 256, 256, 1), jnp.float32),
            "imu": jnp.zeros((n, 3), jnp.float32),
            "actions": jnp.zeros((n, cfg.diffusion_policy.len_traj_pred, 3), jnp.float32),
        }

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[ModelCfg] = None) -> "RDPPolicy":
        cfg = cls.load_config(path, default=cfg)
        pol = cls.build(cfg)
        pol.params = cls.load_params_file(path, pol.params)
        return pol

    def num_recurrent_layers(self) -> int:
        return 1

    def forward(self, batch: Dict[str, Any]):
        """Modes (reference rdp_agent.py:267-337): 'update_rnn' each step,
        'act' when the action cache is empty, 'train' in the trainer."""
        mode = batch.get("mode", "update_rnn")
        rng = batch.get("rng", jax.random.PRNGKey(0))

        def apply_fn(params, obs, states, prev_actions, masks, rng):
            return self.module.apply({"params": params}, obs, states, prev_actions,
                                     masks, mode=mode, rng=rng)

        fn = self.jit_apply(f"fwd_{mode}", lambda: jax.jit(apply_fn))
        return fn(self.params, batch["observations"], batch["rnn_states"],
                  batch["prev_actions"], batch["masks"], rng)

    def unnormalize_actions(self, traj: np.ndarray, cumsum: bool = True) -> np.ndarray:
        """[-1,1] deltas → metric waypoints (reference get_action semantics)."""
        stats = self.ACTION_STATS
        traj = np.asarray(traj)
        deltas = (traj + 1.0) / 2.0 * (stats["max"] - stats["min"]) + stats["min"]
        return np.cumsum(deltas, axis=-2) if cumsum else deltas
