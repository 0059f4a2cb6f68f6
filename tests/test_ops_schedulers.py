"""Scheduler semantics tests.

diffusers isn't installed; DDPM is validated against a hand-rolled
reference implementation of the published DDPM posterior equations, and
flow-matching against exact integration of a linear vector field.
"""

import numpy as np
import jax
import jax.numpy as jnp

from internnav_tpu.ops import DDPMScheduler, FlowMatchEulerScheduler


def test_ddpm_betas_cosine_shape():
    sch = DDPMScheduler(num_train_timesteps=10)
    betas = np.asarray(sch.betas)
    assert betas.shape == (10,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # cosine schedule: increasing betas
    assert (np.diff(betas) > 0).all()


def test_ddpm_add_noise_snr():
    sch = DDPMScheduler(num_train_timesteps=100)
    x0 = jnp.ones((4, 8, 3))
    noise = jnp.zeros_like(x0)
    # zero noise: x_t = sqrt(abar)*x0 exactly
    t = jnp.asarray([0, 10, 50, 99])
    xt = sch.add_noise(x0, noise, t)
    expected = jnp.sqrt(sch.alphas_cumprod[t])
    np.testing.assert_allclose(np.asarray(xt[:, 0, 0]), np.asarray(expected), atol=1e-6)


def test_ddpm_step_recovers_x0_deterministic():
    """With a perfect epsilon oracle and no sampling noise, the reverse
    chain must recover x0 (up to clip) from pure noise structure."""
    sch = DDPMScheduler(num_train_timesteps=10)
    key = jax.random.PRNGKey(0)
    x0 = jnp.clip(jax.random.normal(key, (2, 8, 2)) * 0.3, -1, 1)
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t_last = jnp.asarray(9)
    xt = sch.add_noise(x0, eps, jnp.full((2,), 9))

    def oracle(x, t):
        # true epsilon that produced x_t from x0 at this t
        abar = sch.alphas_cumprod[t]
        return (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1 - abar)

    x = xt
    for t in np.asarray(sch.timesteps()):
        x = sch.step(oracle(x, jnp.asarray(t)), jnp.asarray(t), x, noise=jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddpm_denoise_scan_matches_loop():
    sch = DDPMScheduler(num_train_timesteps=10)
    key = jax.random.PRNGKey(42)
    x_init = jax.random.normal(key, (3, 8, 2))

    def predict(x, t):
        return 0.5 * x  # arbitrary fixed function

    out_scan = sch.denoise_scan(predict, x_init, jax.random.PRNGKey(7))
    # manual loop with the same noise draws
    ts = sch.timesteps()
    noises = jax.random.normal(jax.random.PRNGKey(7), (len(ts),) + x_init.shape, x_init.dtype)
    x = x_init
    for i, t in enumerate(np.asarray(ts)):
        x = sch.step(predict(x, t), jnp.asarray(t), x, noise=noises[i])
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x), atol=1e-5)


def test_flow_match_interpolation_and_target():
    sch = FlowMatchEulerScheduler(num_train_timesteps=1000)
    x0 = jnp.ones((2, 4, 3))
    noise = -jnp.ones_like(x0)
    t = jnp.asarray([0, 500])
    xt = sch.add_noise(x0, noise, t)
    np.testing.assert_allclose(np.asarray(xt[0]), 1.0, atol=1e-6)  # sigma=0 → x0
    np.testing.assert_allclose(np.asarray(xt[1]), 0.0, atol=1e-6)  # sigma=.5 → mid
    np.testing.assert_allclose(np.asarray(sch.velocity_target(x0, noise)), -2.0)


def test_flow_match_euler_integrates_to_x0():
    """With the exact constant velocity v = ε − x0, Euler integration from
    x_1 = ε must land exactly on x0 (the flow is linear in σ)."""
    sch = FlowMatchEulerScheduler()
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (4, 8, 3))
    eps = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    v = eps - x0

    out = sch.denoise_scan(lambda x, t: v, eps, num_inference_steps=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_flow_match_sigmas_grid():
    sch = FlowMatchEulerScheduler()
    sig = sch.inference_sigmas(10)
    assert sig[0] == 1.0 and sig[-1] == 0.0
    np.testing.assert_allclose(sig[-2], 0.1, atol=1e-6)
