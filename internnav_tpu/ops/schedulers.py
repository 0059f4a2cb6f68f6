"""Diffusion noise schedulers as pure JAX (replacing the `diffusers` dep).

Two schedulers are used by the reference model zoo:
- DDPM with squaredcos_cap_v2 betas, epsilon prediction, clip_sample
  (NavDP: navdp_policy.py:119-121 with T=10; embedded N1 NavDP:
  internvla_n1/navdp.py:74-76 with T=20; RDP: rdp_policy.py denoise loop).
- Flow-matching Euler for the NextDiT System-1 head
  (internvla_n1.py:360-441: sigmas = linspace(1, 1/n, n), Euler update,
  training interpolation x_t = (1-σ)x0 + σ·ε with velocity target ε - x0).

Both are implemented as stateless parameter structs + functional `step`
so the full denoise loop can live inside one jitted `lax.scan` — the
"denoise-loop throughput" win called out in SURVEY.md §7.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _squaredcos_cap_v2_betas(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """Cosine alpha-bar schedule (Nichol & Dhariwal), diffusers-compatible."""

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    t1 = np.arange(num_steps) / num_steps
    t2 = (np.arange(num_steps) + 1) / num_steps
    return np.minimum(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta).astype(np.float32)


def _linear_betas(num_steps: int, beta_start=1e-4, beta_end=2e-2) -> np.ndarray:
    return np.linspace(beta_start, beta_end, num_steps, dtype=np.float32)


@dataclass(frozen=True)
class DDPMScheduler:
    """DDPM with epsilon/sample prediction, fixed_small posterior variance."""

    num_train_timesteps: int = 10
    beta_schedule: str = "squaredcos_cap_v2"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    betas: jnp.ndarray = field(default=None, compare=False)
    alphas_cumprod: jnp.ndarray = field(default=None, compare=False)

    def __post_init__(self):
        if self.beta_schedule == "squaredcos_cap_v2":
            betas = _squaredcos_cap_v2_betas(self.num_train_timesteps)
        elif self.beta_schedule == "linear":
            betas = _linear_betas(self.num_train_timesteps)
        else:
            raise ValueError(self.beta_schedule)
        alphas = 1.0 - betas
        object.__setattr__(self, "betas", jnp.asarray(betas))
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(np.cumprod(alphas)))

    # ------------------------------------------------------------ training
    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0). t: (B,) int timesteps."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(abar).reshape(shape)
        sb = jnp.sqrt(1.0 - abar).reshape(shape)
        return sa * x0 + sb * noise

    # ----------------------------------------------------------- inference
    def timesteps(self, num_inference_steps: Optional[int] = None) -> jnp.ndarray:
        """Descending timestep sequence (diffusers set_timesteps semantics)."""
        n = num_inference_steps or self.num_train_timesteps
        ratio = self.num_train_timesteps // n
        ts = (np.arange(n) * ratio).round()[::-1].astype(np.int64)
        return jnp.asarray(ts)

    def step(
        self, model_output: jnp.ndarray, t: jnp.ndarray, sample: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
        num_inference_steps: Optional[int] = None,
    ) -> jnp.ndarray:
        """One reverse step x_t → x_{t-1}. `noise` supplies the stochastic
        part (pass zeros for deterministic / pre-sampled for parity)."""
        n = num_inference_steps or self.num_train_timesteps
        prev_t = t - self.num_train_timesteps // n

        abar_t = self.alphas_cumprod[t]
        abar_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_t = 1.0 - abar_t / abar_prev  # current_beta in diffusers
        alpha_t = 1.0 - beta_t

        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - abar_t) * model_output) / jnp.sqrt(abar_t)
        elif self.prediction_type == "sample":
            x0 = model_output
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        # posterior mean coefficients
        c0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
        ct = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
        mean = c0 * x0 + ct * sample

        variance = jnp.clip(beta_t * (1.0 - abar_prev) / (1.0 - abar_t), 1e-20, None)
        if noise is None:
            noise = jnp.zeros_like(sample)
        sigma = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
        return mean + sigma * noise

    def denoise_scan(
        self,
        predict_eps: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        x_init: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        num_inference_steps: Optional[int] = None,
        noises: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full reverse loop as one lax.scan: predict_eps(x, t) → ε.
        `noises` ((T,) + x_init.shape) pre-samples the per-step ancestral
        noise — used by batched/grouped serving so each stream block keeps
        the draw its own single-stream run would have made; default draws
        from `rng`."""
        ts = self.timesteps(num_inference_steps)
        if noises is None:
            noises = jax.random.normal(rng, (len(ts),) + x_init.shape,
                                       x_init.dtype)

        def body(x, inp):
            t, z = inp
            eps = predict_eps(x, t)
            x_next = self.step(eps, t, x, noise=z, num_inference_steps=num_inference_steps)
            return x_next, None

        x_final, _ = jax.lax.scan(body, x_init, (ts, noises))
        return x_final


@dataclass(frozen=True)
class FlowMatchEulerScheduler:
    """Flow-matching with discrete Euler steps (diffusers
    FlowMatchEulerDiscreteScheduler semantics as used at
    internvla_n1.py:360-441 and 264-276)."""

    num_train_timesteps: int = 1000
    shift: float = 1.0

    # ------------------------------------------------------------ training
    def sigmas_for_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Training σ for integer timesteps drawn uniform from [0, T)."""
        s = t.astype(jnp.float32) / self.num_train_timesteps
        if self.shift != 1.0:
            s = self.shift * s / (1.0 + (self.shift - 1.0) * s)
        return s

    def add_noise(self, x0, noise, t):
        """x_t = (1-σ)·x0 + σ·ε (reference internvla_n1.py:270)."""
        sigma = self.sigmas_for_timesteps(t).reshape((-1,) + (1,) * (x0.ndim - 1))
        return (1.0 - sigma) * x0 + sigma * noise

    @staticmethod
    def velocity_target(x0, noise):
        """Model target: ε − x0 (reference internvla_n1.py:283)."""
        return noise - x0

    # ----------------------------------------------------------- inference
    def inference_sigmas(self, num_inference_steps: int) -> np.ndarray:
        """σ grid linspace(1, 1/n, n) with terminal 0 appended
        (reference internvla_n1.py:396-397)."""
        s = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        if self.shift != 1.0:
            s = self.shift * s / (1.0 + (self.shift - 1.0) * s)
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def denoise_scan(
        self,
        predict_velocity: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        x_init: jnp.ndarray,
        num_inference_steps: int = 10,
    ) -> jnp.ndarray:
        """Euler integration x ← x + (σ_next − σ)·v as one lax.scan.

        predict_velocity(x, t) with t = σ·num_train_timesteps (the discrete
        timestep fed to the DiT's timestep embedding).
        """
        sig = jnp.asarray(self.inference_sigmas(num_inference_steps))

        def body(x, i):
            s_cur, s_next = sig[i], sig[i + 1]
            t = s_cur * self.num_train_timesteps
            v = predict_velocity(x, t)
            return x + (s_next - s_cur) * v, None

        x_final, _ = jax.lax.scan(body, x_init, jnp.arange(num_inference_steps))
        return x_final
