"""Batched NavDP System-1 serving parity vs the single-stream policy.

The reference's flagship dual-system config also ships a NavDP System-1
(`navdp_async`, internvla_n1_arch.py:10, navdp.py:16-313); its evaluator
runs it one episode per GPU rank. Here the NavDP head is servable batched
(B streams, one denoise program) exactly like the nextdit head —
batching must be a pure throughput transform:

- B=1 is bit-equal to the single-stream policy (same draws, same shapes);
- at B>1, injecting each row's single-stream noise (x_init + per-step
  ancestral noises) reproduces that row's single-stream trajectory to
  GEMM-reduction epsilon — proving rows are independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internnav_tpu.model.basemodel.internvla_n1.model import (
    InternVLAN1Config,
    InternVLAN1Model,
)
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.basemodel.internvla_n1.serving import BatchedN1Policy

IMG_HW = 56
NST = 4


@pytest.fixture(scope="module")
def built():
    cfg = InternVLAN1Config.tiny("navdp_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    return cfg, single


def _rgbd_pairs(seed, b):
    rs = np.random.RandomState(seed)
    rgb = rs.randint(0, 255, (b, 2, IMG_HW, IMG_HW, 3)).astype(np.uint8)
    depth = rs.rand(b, 2, IMG_HW, IMG_HW, 1).astype(np.float32) * 4.0
    return rgb, depth


def _latents(seed, b, cfg):
    return jnp.asarray(0.1 * np.random.RandomState(seed).randn(
        b, cfg.n_query, cfg.text.hidden_size), jnp.float32)


def test_navdp_batched_b1_bit_matches_single_stream(built):
    cfg, single = built
    b1 = BatchedN1Policy(single.model, single.params, cfg, batch_size=1,
                         tokenizer=single.tokenizer)
    latent = _latents(0, 1, cfg)
    rgb, depth = _rgbd_pairs(7, 1)

    single._rng = jax.random.PRNGKey(42)
    ref = single.s1_step_latent(rgb, depth, latent, num_sample_trajs=NST)
    b1._rng = jax.random.PRNGKey(42)
    got = b1.s1_step_latent(rgb, latent, num_sample_trajs=NST,
                            depth=depth)[0]

    np.testing.assert_allclose(np.asarray(got.trajectory, np.float32),
                               np.asarray(ref.trajectory, np.float32),
                               atol=1e-5, rtol=1e-5)
    assert got.idx == ref.idx


def test_navdp_batched_rows_are_independent(built):
    """B=2 with per-row injected noise reproduces each row's single-stream
    run: the batched program is row-independent (only GEMM reduction
    blocking at the larger batch differs)."""
    cfg, single = built
    model: InternVLAN1Model = single.model
    params = single.params
    latents = _latents(1, 2, cfg)
    rgb, depth = _rgbd_pairs(8, 2)
    im = jnp.asarray(rgb, jnp.float32) / 255.0
    de = jnp.asarray(depth, jnp.float32)

    P = 8  # tiny navdp head predict_size
    T = 20  # DDPM num_train_timesteps

    keys = [jax.random.PRNGKey(100 + b) for b in range(2)]
    refs = []
    for b in range(2):
        dp = model.apply(
            {"params": params},
            method=lambda mdl: mdl.generate_traj_navdp(
                latents[b:b + 1], im[b:b + 1], de[b:b + 1],
                rng=keys[b], sample_num=NST))
        refs.append(np.asarray(dp, np.float32))
        assert refs[-1].shape == (NST, P, 3)

    x_init = jnp.concatenate([
        jax.random.normal(k, (NST, P, 3)) for k in keys])
    step_noises = jnp.concatenate([
        jax.random.normal(jax.random.fold_in(k, 1), (T, NST, P, 3))
        for k in keys], axis=1)
    dp2 = model.apply(
        {"params": params},
        method=lambda mdl: mdl.generate_traj_navdp_batched(
            latents, im, de, rng=keys[0], sample_num=NST,
            x_init=x_init, step_noises=step_noises))
    dp2 = np.asarray(dp2, np.float32).reshape(2, NST, P, 3)

    for b in range(2):
        np.testing.assert_allclose(dp2[b], refs[b], atol=1e-4, rtol=1e-4)


def test_navdp_batched_shapes_and_bucketing(built):
    """B=3 takes the 3*2^k bucket; outputs align with input rows."""
    cfg, single = built
    pol = BatchedN1Policy(single.model, single.params, cfg, batch_size=3,
                          tokenizer=single.tokenizer)
    latents = _latents(2, 3, cfg)
    rgb, depth = _rgbd_pairs(9, 3)
    outs = pol.s1_step_latent(rgb, latents, num_sample_trajs=NST,
                              depth=depth)
    assert len(outs) == 3
    for o in outs:
        assert o.trajectory.shape == (NST, 8, 3)
        assert all(a in (1, 2, 3) for a in o.idx)


def test_navdp_sync_batched_latents_only():
    """The sync (non-async) NavDP head conditions on latents alone —
    rgb/depth are ignored; B=1 bit-matches single-stream."""
    cfg = InternVLAN1Config.tiny("navdp")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    pol = BatchedN1Policy(single.model, single.params, cfg, batch_size=2,
                          tokenizer=single.tokenizer)
    latents = _latents(3, 2, cfg)
    pol._rng = jax.random.PRNGKey(5)
    outs = pol.s1_step_latent(None, latents, num_sample_trajs=NST)
    assert len(outs) == 2
    assert outs[0].trajectory.shape == (NST, 8, 3)

    b1 = BatchedN1Policy(single.model, single.params, cfg, batch_size=1,
                         tokenizer=single.tokenizer)
    rgb, depth = _rgbd_pairs(11, 1)
    single._rng = jax.random.PRNGKey(6)
    ref = single.s1_step_latent(rgb, depth, latents[:1],
                                num_sample_trajs=NST)
    b1._rng = jax.random.PRNGKey(6)
    got = b1.s1_step_latent(None, latents[:1], num_sample_trajs=NST)[0]
    np.testing.assert_allclose(np.asarray(got.trajectory, np.float32),
                               np.asarray(ref.trajectory, np.float32),
                               atol=1e-5, rtol=1e-5)
    assert got.idx == ref.idx


def test_pipelined_navdp_cohorts_match_sequential(built):
    """PipelinedN1Server with navdp cohorts (frames_fn returning
    (rgb, depth) pairs for S1 phases) matches sequential blocking runs."""
    from internnav_tpu.model.basemodel.internvla_n1.serving import (
        PipelinedN1Server,
    )

    cfg, single = built
    INSTR = ["walk to the kitchen and stop",
             "turn left at the sofa then stop"]
    s2f = {ci: _rgbd_pairs(20 + ci, 2)[0][:, 0] for ci in range(2)}
    s1f = {ci: _rgbd_pairs(30 + ci, 2) for ci in range(2)}

    seq_text, seq_idx = {}, {}
    for ci in range(2):
        pol = BatchedN1Policy(single.model, single.params, cfg, 2,
                              tokenizer=single.tokenizer)
        pol._rng = jax.random.PRNGKey(300 + ci)
        pol.reset(INSTR)
        outs = pol.s2_step(s2f[ci], max_new_tokens=4)
        lat = jnp.concatenate([
            o.output_latent if o.output_latent is not None
            else jnp.zeros((1, cfg.n_query, cfg.text.hidden_size),
                           jnp.bfloat16)
            for o in outs], axis=0)
        s1 = pol.s1_step_latent(s1f[ci][0], lat, num_sample_trajs=NST,
                                depth=s1f[ci][1])
        seq_text[ci] = [s.llm_output for s in pol.slots]
        seq_idx[ci] = [o.idx for o in s1]

    server = PipelinedN1Server(single.model, single.params, cfg,
                               batch_size=2, cohorts=2,
                               tokenizer=single.tokenizer)
    for ci, pol in enumerate(server.cohorts):
        pol._rng = jax.random.PRNGKey(300 + ci)
        pol.reset(INSTR)

    def frames_fn(ci, phase):
        return s2f[ci] if phase == 0 else s1f[ci]

    res = server.serve_macro_cycle(frames_fn, max_new_tokens=4,
                                   num_sample_trajs=NST, s1_calls=1)
    for ci, pol in enumerate(server.cohorts):
        assert [s.llm_output for s in pol.slots] == seq_text[ci]
        assert [o.idx for o in res[ci][1][0]] == seq_idx[ci]
