"""NavDP trainer.

Loss parity with the reference NavDPTrainer.compute_loss
(internnav/trainer/navdp_trainer.py:26-123):
loss = 0.8 * (0.5*ng + 0.5*mg diffusion MSE)
     + 0.2 * (critic label MSE + critic augment MSE)
     + 0.5 * (0.5*imagegoal-aux + 0.5*pixelgoal-aux MSE vs pointgoal).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from internnav_tpu.trainer.base import Trainer


class NavDPTrainer(Trainer):
    batch_axis = 0

    def __init__(self, cfg, policy, **kw):
        # diffusion trainers keep an EMA of the params by default — the
        # reference imports diffusion_policy's EMAModel (SURVEY §2.2);
        # explicit il.use_ema=False opts out
        if "use_ema" not in cfg.il.model_fields_set:
            cfg.il.use_ema = True
        super().__init__(cfg, policy, **kw)

    def loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        o = batch["observations"]
        (eps_ng, eps_mg, critic_label, critic_augment, ng_noise, mg_noise,
         image_aux, pixel_aux) = self.policy.module.apply(
            {"params": params},
            o["goal_point"], o["goal_image"], o["goal_pixel"],
            o["input_images"], o["input_depths"],
            o["output_actions"], o["augment_actions"], rng,
        )
        ng_loss = jnp.mean((eps_ng - ng_noise) ** 2)
        mg_loss = jnp.mean((eps_mg - mg_noise) ** 2)
        action_loss = 0.5 * ng_loss + 0.5 * mg_loss
        critic_loss = (
            jnp.mean((critic_label - batch["label_critic"]) ** 2)
            + jnp.mean((critic_augment - batch["augment_critic"]) ** 2)
        )
        aux_loss = 0.5 * jnp.mean((o["goal_point"] - image_aux) ** 2) + \
            0.5 * jnp.mean((o["goal_point"] - pixel_aux) ** 2)
        loss = 0.8 * action_loss + 0.2 * critic_loss + 0.5 * aux_loss
        return loss, {
            "ng_action_loss": ng_loss,
            "mg_action_loss": mg_loss,
            "critic_loss": critic_loss,
            "aux_loss": aux_loss,
        }
