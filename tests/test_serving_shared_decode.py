"""Shared grouped decode: PipelinedN1Server(shared_decode=True) batches
every cohort's greedy decode + traj-latent chunk into ONE device program
(one decoder weight stream per token for all cohorts). Must be
slot-for-slot identical to the per-cohort fused path — it's a scheduling/
batching change, never a semantics change."""

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _small_n1_config
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.basemodel.internvla_n1.serving import (
    BatchedN1Policy,
    PipelinedN1Server,
)

IMG_HW = 56
INSTR = ["walk to the kitchen and stop",
         "turn left at the sofa then go to the red door"]


def _frames(seed, n):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 255, (IMG_HW, IMG_HW, 3)).astype(np.uint8)
            for _ in range(n)]


def test_shared_decode_stream_matches_fused_stream():
    cfg = _small_n1_config()
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    f = _frames(77, 6)
    frames = {(ci, t): np.stack([f[(2 * t + ci) % 6], f[(2 * t + ci + 1) % 6]])
              for ci in range(2) for t in range(2)}

    def run(shared):
        server = PipelinedN1Server(single.model, single.params, cfg,
                                   batch_size=2, cohorts=2,
                                   tokenizer=single.tokenizer)
        got_text, got_s1 = {}, {}

        def on_cycle(ci, t, s2out, s1res):
            got_text[(ci, t)] = [s.llm_output
                                 for s in server.cohorts[ci].slots]
            got_s1[(ci, t)] = [o.idx for o in s1res[0]]

        for ci, pol in enumerate(server.cohorts):
            pol._rng = jax.random.PRNGKey(500 + ci)
            pol.reset(INSTR)
        server.serve_stream(lambda ci, t, phase: frames[(ci, t)], 2,
                            max_new_tokens=4, num_sample_trajs=2,
                            s1_calls=1, on_cycle=on_cycle,
                            shared_decode=shared)
        return got_text, got_s1

    ref_text, ref_s1 = run(shared=False)
    got_text, got_s1 = run(shared=True)
    assert got_text == ref_text
    assert got_s1 == ref_s1


def test_prefill_plus_shared_decode_matches_s2_step():
    """Single cohort: s2_prefill_submit + _shared_decode + s2_collect ==
    the fused s2_step, token for token and latent for latent."""
    cfg = _small_n1_config()
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    f = _frames(33, 2)
    imgs = np.stack(f)

    ref = BatchedN1Policy(single.model, single.params, cfg, 2,
                          tokenizer=single.tokenizer)
    ref.reset(INSTR)
    ref_outs = ref.s2_step(imgs, max_new_tokens=4)

    server = PipelinedN1Server(single.model, single.params, cfg,
                               batch_size=2, cohorts=1,
                               tokenizer=single.tokenizer)
    pol = server.cohorts[0]
    pol.reset(INSTR)
    h = pol.s2_prefill_submit(imgs, max_new_tokens=4)
    server._shared_decode([h])
    outs = pol.s2_collect(h)

    assert [s.llm_output for s in pol.slots] == \
        [s.llm_output for s in ref.slots]
    for g, r in zip(outs, ref_outs):
        assert (g.output_latent is None) == (r.output_latent is None)
        if g.output_latent is not None:
            np.testing.assert_allclose(
                np.asarray(g.output_latent, np.float32),
                np.asarray(r.output_latent, np.float32),
                atol=2e-5, rtol=2e-5)
        assert g.output_action == r.output_action
