"""Batched multi-episode serving parity vs the single-stream policy.

The batched path (serving.BatchedN1Policy) must be *behaviorally
identical* per slot to InternVLAN1Policy — batching is a pure throughput
transform (amortized decode weight reads), never a semantics change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _small_n1_config
from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Model
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.basemodel.internvla_n1.serving import BatchedN1Policy

IMG_HW = 56


@pytest.fixture(scope="module")
def built():
    cfg = _small_n1_config()
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    batched = BatchedN1Policy(single.model, single.params, cfg, batch_size=2,
                              tokenizer=single.tokenizer)
    return cfg, single, batched


def _frames(seed, n):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 255, (IMG_HW, IMG_HW, 3)).astype(np.uint8)
            for _ in range(n)]


INSTR = ["walk to the kitchen and stop",
         "turn left at the sofa then go forward to the red door and wait"]


def test_batched_s2_matches_single_stream(built):
    cfg, single, batched = built
    steps = 3
    frames = {i: _frames(100 + i, steps) for i in range(2)}

    # single-stream reference run per slot
    ref_tokens, ref_latents = {}, {}
    for i in range(2):
        single.reset()
        for t in range(steps):
            out = single.s2_step(frames[i][t], INSTR[i], max_new_tokens=6)
        ref_tokens[i] = single.llm_output
        ref_latents[i] = (None if out.output_latent is None
                          else np.asarray(out.output_latent, np.float32))

    batched.reset(INSTR)
    for t in range(steps):
        outs = batched.s2_step(
            np.stack([frames[0][t], frames[1][t]]), max_new_tokens=6)

    for i in range(2):
        assert batched.slots[i].llm_output == ref_tokens[i], (
            f"slot {i}: batched decode diverged from single-stream")
        if ref_latents[i] is not None:
            got = np.asarray(outs[i].output_latent, np.float32)
            np.testing.assert_allclose(got, ref_latents[i], atol=2e-2,
                                       rtol=2e-2)


def test_batched_b1_s1_matches_single_stream(built):
    cfg, single, batched1 = built
    b1 = BatchedN1Policy(single.model, single.params, cfg, batch_size=1,
                         tokenizer=single.tokenizer)
    latent = jnp.asarray(
        0.1 * np.random.RandomState(0).randn(
            1, cfg.n_query, cfg.text.hidden_size), jnp.float32)
    rgb = np.stack(_frames(7, 2))[None]  # (1, 2, H, W, 3)

    single._rng = jax.random.PRNGKey(42)
    ref = single.s1_step_latent(rgb, None, latent, num_sample_trajs=4)
    b1._rng = jax.random.PRNGKey(42)
    got = b1.s1_step_latent(rgb, latent, num_sample_trajs=4)[0]

    np.testing.assert_allclose(np.asarray(got.trajectory, np.float32),
                               np.asarray(ref.trajectory, np.float32),
                               atol=1e-5, rtol=1e-5)
    assert got.idx == ref.idx


def test_batched_s1_shapes(built):
    cfg, single, batched = built
    latents = jnp.asarray(
        0.1 * np.random.RandomState(1).randn(
            2, cfg.n_query, cfg.text.hidden_size), jnp.float32)
    rgb = np.stack([np.stack(_frames(8, 2)), np.stack(_frames(9, 2))])
    outs = batched.s1_step_latent(rgb, latents, num_sample_trajs=4)
    assert len(outs) == 2
    for o in outs:
        assert o.trajectory.shape == (4, cfg.predict_step_nums, 3)
        assert all(a in (1, 2, 3) for a in o.idx)


def test_slot_reset_regroups(built):
    """After resetting one slot mid-run, rows fall into two history-length
    groups; both must still produce valid outputs."""
    cfg, single, batched = built
    batched.reset(INSTR)
    f = _frames(33, 4)
    batched.s2_step(np.stack([f[0], f[1]]), max_new_tokens=4)
    batched.reset_slot(1, "go straight and stop")
    outs = batched.s2_step(np.stack([f[2], f[3]]), max_new_tokens=4)
    assert len(outs) == 2
    assert all(o is not None for o in outs)
    # slot 0 has 2 frames of history context, slot 1 has 1
    assert batched.slots[0].episode_idx == 2
    assert batched.slots[1].episode_idx == 1


def test_s1_cached_memory_path_matches_legacy_pairs(built):
    """The current-frames-only S1 path (device-cached memory frame +
    cached DINOv2 features) must match the legacy [memory, current] pixel
    path: feature caching is a transfer optimization, not a semantics
    change. Covers both the first call (full: memory encoded, features
    stored) and the second call (cached features reused). Uses an ASYNC
    tiny config — only nextdit_async consumes the frames."""
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )

    cfg = InternVLAN1Config.tiny("nextdit_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    pol = BatchedN1Policy(single.model, single.params, cfg, batch_size=2,
                          tokenizer=single.tokenizer)
    latents = jnp.asarray(
        0.1 * np.random.RandomState(5).randn(
            2, cfg.n_query, cfg.text.hidden_size), jnp.float32)
    mem = np.stack(_frames(21, 2))       # (2, H, W, 3) memory frames
    cur1 = np.stack(_frames(22, 2))      # current frames, call 1
    cur2 = np.stack(_frames(23, 2))      # current frames, call 2

    # legacy explicit-pairs reference
    pol._rng = jax.random.PRNGKey(7)
    ref1 = pol.s1_step_latent(np.stack([mem, cur1], axis=1), latents,
                              num_sample_trajs=4)
    ref2 = pol.s1_step_latent(np.stack([mem, cur2], axis=1), latents,
                              num_sample_trajs=4)

    # cached path: memory frame device-cached, features computed once
    for i, s in enumerate(pol.slots):
        s.s1_mem_frame = jnp.asarray(mem[i])
        s.s1_mem_feats = None
    pol._rng = jax.random.PRNGKey(7)
    got1 = pol.s1_step_latent(cur1, latents, num_sample_trajs=4)
    assert all(s.s1_mem_feats is not None for s in pol.slots)
    got2 = pol.s1_step_latent(cur2, latents, num_sample_trajs=4)

    for ref, got in ((ref1, got1), (ref2, got2)):
        for r, g in zip(ref, got):
            # the two paths batch the DINOv2 towers differently (2B-stack
            # vs B+B), so reduction order differs at float epsilon; the 10
            # Euler steps amplify that to ~1e-3 on the trajectories
            np.testing.assert_allclose(
                np.asarray(g.trajectory, np.float32),
                np.asarray(r.trajectory, np.float32), atol=5e-3, rtol=5e-3)
            assert g.idx == r.idx


def test_pipelined_cohorts_match_sequential(built):
    """PipelinedN1Server's phase-interleaved macro-cycle must produce the
    same per-slot decodes and S1 actions as running the same cohorts
    sequentially (blocking) — pipelining is a scheduling change only."""
    from internnav_tpu.model.basemodel.internvla_n1.serving import (
        PipelinedN1Server,
    )

    cfg, single, _ = built
    f = _frames(11, 4)

    def cohort_frames(ci):
        return np.stack([f[2 * ci], f[2 * ci + 1]])

    # sequential blocking reference (two independent cohorts)
    seq_text, seq_idx = {}, {}
    for ci in range(2):
        pol = BatchedN1Policy(single.model, single.params, cfg, 2,
                              tokenizer=single.tokenizer)
        pol._rng = jax.random.PRNGKey(100 + ci)
        pol.reset(INSTR)
        outs = pol.s2_step(cohort_frames(ci), max_new_tokens=4)
        lat = jnp.concatenate([
            o.output_latent if o.output_latent is not None
            else jnp.zeros((1, cfg.n_query, cfg.text.hidden_size))
            for o in outs], axis=0)
        s1 = pol.s1_step_latent(cohort_frames(ci), lat, num_sample_trajs=4)
        seq_text[ci] = [s.llm_output for s in pol.slots]
        seq_idx[ci] = [o.idx for o in s1]

    server = PipelinedN1Server(single.model, single.params, cfg,
                               batch_size=2, cohorts=2,
                               tokenizer=single.tokenizer)
    for ci, pol in enumerate(server.cohorts):
        pol._rng = jax.random.PRNGKey(100 + ci)
        pol.reset(INSTR)
    res = server.serve_macro_cycle(lambda ci, phase: cohort_frames(ci),
                                   max_new_tokens=4, num_sample_trajs=4,
                                   s1_calls=1)
    for ci, pol in enumerate(server.cohorts):
        assert [s.llm_output for s in pol.slots] == seq_text[ci]
        assert [o.idx for o in res[ci][1][0]] == seq_idx[ci]


def test_serve_stream_matches_blocking_cycles(built):
    """serve_stream (cycle-boundary pipelined) must produce the same
    per-slot S2 decodes per cycle as blocking macro-steps on the same
    cohort state."""
    from internnav_tpu.model.basemodel.internvla_n1.serving import (
        PipelinedN1Server,
    )

    cfg, single, _ = built
    f = _frames(55, 6)
    frames = {(ci, t): np.stack([f[(2 * t + ci) % 6], f[(2 * t + ci + 1) % 6]])
              for ci in range(2) for t in range(2)}

    # blocking reference: two independent cohorts, two macro-cycles each
    want = {}
    for ci in range(2):
        pol = BatchedN1Policy(single.model, single.params, cfg, 2,
                              tokenizer=single.tokenizer)
        pol._rng = jax.random.PRNGKey(200 + ci)
        pol.reset(INSTR)
        for t in range(2):
            pol.s2_step(frames[(ci, t)], max_new_tokens=4)
            want[(ci, t)] = [s.llm_output for s in pol.slots]

    server = PipelinedN1Server(single.model, single.params, cfg,
                               batch_size=2, cohorts=2,
                               tokenizer=single.tokenizer)
    got = {}

    def on_cycle(ci, t, s2out, s1res):
        got[(ci, t)] = [s.llm_output for s in server.cohorts[ci].slots]

    for ci, pol in enumerate(server.cohorts):
        pol._rng = jax.random.PRNGKey(200 + ci)
        pol.reset(INSTR)
    server.serve_stream(lambda ci, t, phase: frames[(ci, t)], 2,
                        max_new_tokens=4, num_sample_trajs=2, s1_calls=1,
                        on_cycle=on_cycle)
    assert got == want


def test_3x2k_bucket_parity(built):
    """B=3 takes the 3*2^k compute bucket (exactly 3, no padding) and B=5
    pads to 6 — per-slot results must match the single-stream policy
    regardless of the bucket chosen (padded rows are discarded)."""
    cfg, single, _ = built
    assert BatchedN1Policy._pow2_bucket(3) == 3
    assert BatchedN1Policy._pow2_bucket(5) == 6
    assert BatchedN1Policy._pow2_bucket(24) == 24
    assert BatchedN1Policy._pow2_bucket(48) == 48

    instr3 = INSTR + ["go straight past the table and stop at the plant"]
    frames = {i: _frames(300 + i, 2) for i in range(3)}

    ref = {}
    for i in range(3):
        single.reset()
        for t in range(2):
            single.s2_step(frames[i][t], instr3[i], max_new_tokens=6)
        ref[i] = single.llm_output

    b3 = BatchedN1Policy(single.model, single.params, cfg, batch_size=3,
                         tokenizer=single.tokenizer)
    b3.reset(instr3)
    for t in range(2):
        b3.s2_step(np.stack([frames[i][t] for i in range(3)]),
                   max_new_tokens=6)
    for i in range(3):
        assert b3.slots[i].llm_output == ref[i], f"slot {i} diverged (B=3)"
