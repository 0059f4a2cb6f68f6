"""CMA / Seq2Seq imitation-learning trainer.

Loss parity with the reference CMATrainer.compute_loss
(internnav/trainer/cma_trainer.py:40-113): per-step cross-entropy over
(T, N) action logits, inflection-weight normalized per env then averaged,
plus progress-monitor MSE with the same weighting. Zero initial RNN state
per batch (sequences start at episode starts).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from internnav_tpu.trainer.base import Trainer


def inflection_weighted_ce(
    logits: jnp.ndarray,  # (T, N, A)
    actions: jnp.ndarray,  # (T, N) int
    weights: jnp.ndarray,  # (T, N) inflection weights (0 at padding)
) -> jnp.ndarray:
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, actions)  # (T, N)
    per_env = (weights * ce).sum(0) / jnp.maximum(weights.sum(0), 1e-8)
    return per_env.mean()


class CMATrainer(Trainer):
    batch_axis = 1  # batches are time-major (T, N, ...)

    def loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        obs = batch["observations"]  # each (T, N, ...)
        actions = batch["corrected_actions"]  # (T, N)
        weights = batch["weights"]  # (T, N)
        prev_actions = batch["prev_actions"]  # (T, N)
        masks = batch["masks"]  # (T, N)
        T, N = actions.shape
        H = self.cfg.model.state_encoder.hidden_size
        layers = 2 if self.cfg.model.policy_name == "CMA_Policy" else 1
        rnn_states = jnp.zeros((N, layers, H))

        logits, _, progress = self.policy.module.apply(
            {"params": params}, obs, rnn_states, prev_actions, masks
        )
        action_loss = inflection_weighted_ce(logits, actions.astype(jnp.int32), weights)

        aux_loss = jnp.zeros(())
        if self.cfg.model.progress_monitor.use and "progress" in obs:
            p_hat = progress.reshape(T, N)
            p_gt = obs["progress"].reshape(T, N)
            mse = (p_hat - p_gt) ** 2
            aux_loss = ((weights * mse).sum(0) / jnp.maximum(weights.sum(0), 1e-8)).mean()
            aux_loss = aux_loss * self.cfg.model.progress_monitor.alpha

        loss = action_loss + aux_loss
        return loss, {"action_loss": action_loss, "aux_loss": aux_loss}


class Seq2SeqTrainer(CMATrainer):
    """Same loss; the policy differs (reference reuses CMATrainer for
    seq2seq via trainer dispatch in scripts/train/base_train/train.py)."""
