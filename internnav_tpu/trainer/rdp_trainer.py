"""RDP trainer — diffusion ε-MSE + aux losses.

Reference: internnav/trainer/rdp_trainer.py — per-step losses: MSE between
predicted and true noise over the action trajectory (with action masking),
progress-monitor MSE and stop-progress MSE (loss_alpha-weighted). Batches
here are single-step (B, ...) with precomputed normalized actions.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from internnav_tpu.trainer.base import Trainer


class RDPTrainer(Trainer):
    batch_axis = 0
    stop_loss_alpha: float = 10.0

    def __init__(self, cfg, policy, **kw):
        # diffusion trainers keep an EMA of the params by default — the
        # reference imports diffusion_policy's EMAModel (SURVEY §2.2);
        # explicit il.use_ema=False opts out
        if "use_ema" not in cfg.il.model_fields_set:
            cfg.il.use_ema = True
        super().__init__(cfg, policy, **kw)

    def loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        obs = batch["observations"]
        B = obs["actions"].shape[0]
        H = self.cfg.model.state_encoder.hidden_size
        rnn_states = batch.get("rnn_states", jnp.zeros((B, 1, H)))
        prev_actions = batch.get(
            "prev_actions", jnp.zeros((B, self.cfg.model.len_traj_act, 3))
        )
        masks = batch.get("masks", jnp.ones((B,)))

        eps_pred, noise, _, progress, stop_progress, distance = self.policy.module.apply(
            {"params": params}, obs, rnn_states, prev_actions, masks,
            mode="train", rng=rng,
        )
        act_mask = batch.get("action_mask")  # (B, T) 1 = supervised
        mse = (eps_pred - noise) ** 2
        if act_mask is not None:
            w = act_mask[..., None]
            diffusion_loss = (mse * w).sum() / jnp.maximum(w.sum() * mse.shape[-1], 1e-8)
        else:
            diffusion_loss = mse.mean()

        progress_loss = jnp.zeros(())
        if "progress" in batch:
            progress_loss = jnp.mean((progress.reshape(B) - batch["progress"].reshape(B)) ** 2)
        stop_loss = jnp.zeros(())
        if "stop_progress" in batch:
            stop_loss = jnp.mean(
                (stop_progress.reshape(B) - batch["stop_progress"].reshape(B)) ** 2
            ) * self.stop_loss_alpha

        dist_loss = jnp.zeros(())
        if distance is not None and "distance" in batch:
            dist_loss = jnp.mean(
                (distance.reshape(B) - batch["distance"].reshape(B)) ** 2)
        loss = diffusion_loss + progress_loss + stop_loss + dist_loss
        return loss, {
            "diffusion_loss": diffusion_loss,
            "progress_loss": progress_loss,
            "stop_loss": stop_loss,
        }
