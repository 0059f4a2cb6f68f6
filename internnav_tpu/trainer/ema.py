"""Exponential moving average of model parameters.

Reference parity: the vendored diffusion_policy EMAModel (one of the few
diffusion_policy modules InternNav actually imports, SURVEY.md §2.2) with
the same power-decay warmup schedule. Functional: carry an EMA pytree next
to the train state; `update` is jittable.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def ema_init(params) -> Any:
    # real copies, not aliases: the EMA tree is donated/updated in place by
    # jitted ema_update, so sharing buffers with the live params would
    # delete them
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def ema_decay(step: jnp.ndarray, update_after_step: int = 0,
              inv_gamma: float = 1.0, power: float = 0.75,
              min_value: float = 0.0, max_value: float = 0.9999) -> jnp.ndarray:
    """diffusion_policy EMAModel.get_decay: (1 + s/γ)^(−p) clipped."""
    s = jnp.maximum(step - update_after_step - 1, 0)
    value = 1.0 - (1.0 + s / inv_gamma) ** (-power)
    return jnp.where(s <= 0, 0.0, jnp.clip(value, min_value, max_value))


def ema_update(ema_params, params, step: jnp.ndarray, **decay_kwargs):
    d = ema_decay(step, **decay_kwargs)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
