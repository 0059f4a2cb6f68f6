"""Shared grouped System-1: PipelinedN1Server(shared_s1=True) batches
every cohort's S1 denoise of a micro-step into ONE device program
(`s1_grouped_dispatch`). Row-for-row SEMANTICALLY identical to per-cohort
dispatch — each cohort block keeps its own rng draw (x_init injection)
and the DiT conditioning layout is batch-major. The only difference is
float-epsilon: a different total batch changes GEMM reduction blocking,
so trajectories match to ~1e-6 (asserted tight), and the discretized
action ids match exactly on these fixtures."""

import numpy as np

import jax


def _traj_close(a, b, atol=2e-5, rtol=2e-5):
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=atol, rtol=rtol)

from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.basemodel.internvla_n1.serving import (
    BatchedN1Policy,
    PipelinedN1Server,
    s1_grouped_dispatch,
)

IMG_HW = 56
INSTR = ["walk to the kitchen and stop",
         "turn left at the sofa then go to the red door"]


def _frames(seed, n):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 255, (IMG_HW, IMG_HW, 3)).astype(np.uint8)
            for _ in range(n)]


def test_s1_grouped_dispatch_matches_per_cohort():
    """Direct unit: two cohorts' s1_prepare specs completed by ONE grouped
    program == each cohort's own s1_submit, trajectory for trajectory.
    Covers BOTH modes: the first call is 'full' (memory features fresh),
    the second 'cached'."""
    cfg = InternVLAN1Config.tiny("nextdit_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    f = _frames(11, 4)

    def make_cohorts():
        pols = []
        for ci in range(2):
            pol = BatchedN1Policy(single.model, single.params, cfg, 2,
                                  tokenizer=single.tokenizer)
            pol._rng = jax.random.PRNGKey(900 + ci)
            pol.reset(INSTR)
            pols.append(pol)
        return pols

    def latents_of(pol, imgs):
        outs = pol.s2_step(imgs, max_new_tokens=4)
        rows = [o.output_latent if o.output_latent is not None
                else np.zeros((1, cfg.n_query, cfg.text.hidden_size),
                              np.float32)
                for o in outs]
        return np.concatenate(rows, axis=0)

    imgs = [np.stack([f[ci], f[ci + 2]]) for ci in range(2)]

    ref_pols = make_cohorts()
    ref = []
    for ci, pol in enumerate(ref_pols):
        lat = latents_of(pol, imgs[ci])
        for _call in range(2):  # full then cached
            ref.append(pol.s1_step_latent(imgs[ci], lat,
                                          num_sample_trajs=2))

    got_pols = make_cohorts()
    lats = [latents_of(pol, imgs[ci]) for ci, pol in enumerate(got_pols)]
    got = [None] * 4
    for call in range(2):
        specs = [pol.s1_prepare(imgs[ci], lats[ci], num_sample_trajs=2)
                 for ci, pol in enumerate(got_pols)]
        modes = {s["mode"] for s in specs}
        assert modes == ({"full"} if call == 0 else {"cached"})
        s1_grouped_dispatch(specs)
        for ci, (pol, spec) in enumerate(zip(got_pols, specs)):
            got[ci * 2 + call] = pol.s1_collect(spec["handle"])

    for r_outs, g_outs in zip(ref, got):
        for r, g in zip(r_outs, g_outs):
            # the 'cached' call consumes memory features computed by the
            # OTHER path's first call, so the bf16 epsilon compounds once
            # more than in the stream test — still ~1e-4 in meters, three
            # orders below the 0.25 m action discretization
            _traj_close(r.trajectory, g.trajectory, atol=2e-3, rtol=1e-2)
            assert r.idx == g.idx  # discretized actions identical


def test_shared_s1_stream_matches_per_cohort_stream():
    """End-to-end serve_stream: shared_s1=True == shared_s1=False on every
    decoded text, action list, and S1 trajectory across 2 cycles x 2 S1
    calls (exercising full->cached transitions at cycle boundaries).
    Async system1: the grouped programs run in the production 'full' and
    'cached' modes."""
    cfg = InternVLAN1Config.tiny("nextdit_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    f = _frames(77, 6)
    frames = {(ci, t): np.stack([f[(2 * t + ci) % 6], f[(2 * t + ci + 1) % 6]])
              for ci in range(2) for t in range(2)}

    def run(shared_s1):
        server = PipelinedN1Server(single.model, single.params, cfg,
                                   batch_size=2, cohorts=2,
                                   tokenizer=single.tokenizer)
        got_text, got_s1 = {}, {}

        def on_cycle(ci, t, s2out, s1res):
            got_text[(ci, t)] = [s.llm_output
                                 for s in server.cohorts[ci].slots]
            got_s1[(ci, t)] = [
                (o.idx, np.asarray(o.trajectory).copy())
                for res in s1res for o in res]
            for s in server.cohorts[ci].slots:  # latent refresh
                s.s1_mem_feats = None

        for ci, pol in enumerate(server.cohorts):
            pol._rng = jax.random.PRNGKey(500 + ci)
            pol.reset(INSTR)
        server.serve_stream(lambda ci, t, phase: frames[(ci, t)], 2,
                            max_new_tokens=4, num_sample_trajs=2,
                            s1_calls=2, on_cycle=on_cycle,
                            shared_decode=True, shared_s1=shared_s1)
        return got_text, got_s1

    ref_text, ref_s1 = run(shared_s1=False)
    got_text, got_s1 = run(shared_s1=True)
    assert got_text == ref_text
    assert set(got_s1) == set(ref_s1)
    for k in ref_s1:
        assert len(ref_s1[k]) == len(got_s1[k]) > 0
        for (ri, rt), (gi, gt) in zip(ref_s1[k], got_s1[k]):
            assert ri == gi
            _traj_close(rt, gt)


# ------------------------------------------------------- navdp cohorts
def _rgbd_pairs(seed, b):
    rs = np.random.RandomState(seed)
    rgb = rs.randint(0, 255, (b, 2, IMG_HW, IMG_HW, 3)).astype(np.uint8)
    depth = rs.rand(b, 2, IMG_HW, IMG_HW, 1).astype(np.float32) * 4.0
    return rgb, depth


def test_s1_grouped_dispatch_navdp_matches_per_cohort():
    """NavDP cohorts under shared_s1: two cohorts' navdp s1_prepare specs
    completed by ONE grouped program == each cohort's own s1_submit. The
    NavDP DDPM loop injects per-step ancestral noise, so the grouped
    program draws BOTH x_init and step noises per cohort block from that
    cohort's own key — bit-equal draws, GEMM-epsilon trajectories."""
    cfg = InternVLAN1Config.tiny("navdp_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    NST = 2

    def make_cohorts():
        pols = []
        for ci in range(2):
            pol = BatchedN1Policy(single.model, single.params, cfg, 2,
                                  tokenizer=single.tokenizer)
            pol._rng = jax.random.PRNGKey(910 + ci)
            pols.append(pol)
        return pols

    lats = [np.asarray(
        0.1 * np.random.RandomState(40 + ci).randn(
            2, cfg.n_query, cfg.text.hidden_size), np.float32)
        for ci in range(2)]
    rgbd = [_rgbd_pairs(50 + ci, 2) for ci in range(2)]

    ref = []
    for ci, pol in enumerate(make_cohorts()):
        ref.append(pol.s1_step_latent(rgbd[ci][0], lats[ci],
                                      num_sample_trajs=NST,
                                      depth=rgbd[ci][1]))

    got_pols = make_cohorts()
    specs = [pol.s1_prepare(rgbd[ci][0], lats[ci], num_sample_trajs=NST,
                            depth=rgbd[ci][1])
             for ci, pol in enumerate(got_pols)]
    assert {s["mode"] for s in specs} == {"navdp"}
    s1_grouped_dispatch(specs)
    got = [pol.s1_collect(spec["handle"])
           for pol, spec in zip(got_pols, specs)]

    for r_outs, g_outs in zip(ref, got):
        for r, g in zip(r_outs, g_outs):
            _traj_close(r.trajectory, g.trajectory)
            assert r.idx == g.idx


def test_shared_s1_stream_navdp_matches_per_cohort_stream():
    """End-to-end serve_stream with NavDP cohorts (frames_fn returning
    (rgb, depth) [memory, current] pairs for S1 phases): shared_s1=True ==
    shared_s1=False on every decoded text, action list, and trajectory —
    S2+NavDP rows are servable in the flagship shared-grouped topology."""
    cfg = InternVLAN1Config.tiny("navdp_async")
    single = InternVLAN1Policy.build(cfg, image_hw=IMG_HW)
    s2f = {(ci, t): _rgbd_pairs(60 + 2 * ci + t, 2)[0][:, 0]
           for ci in range(2) for t in range(2)}
    s1f = {(ci, t): _rgbd_pairs(70 + 2 * ci + t, 2)
           for ci in range(2) for t in range(2)}

    def run(shared_s1):
        server = PipelinedN1Server(single.model, single.params, cfg,
                                   batch_size=2, cohorts=2,
                                   tokenizer=single.tokenizer)
        got_text, got_s1 = {}, {}

        def on_cycle(ci, t, s2out, s1res):
            got_text[(ci, t)] = [s.llm_output
                                 for s in server.cohorts[ci].slots]
            got_s1[(ci, t)] = [
                (o.idx, np.asarray(o.trajectory).copy())
                for res in s1res for o in res]

        def frames_fn(ci, t, phase):
            return s2f[(ci, t)] if phase == 0 else s1f[(ci, t)]

        for ci, pol in enumerate(server.cohorts):
            pol._rng = jax.random.PRNGKey(700 + ci)
            pol.reset(INSTR)
        server.serve_stream(frames_fn, 2, max_new_tokens=4,
                            num_sample_trajs=2, s1_calls=2,
                            on_cycle=on_cycle, shared_decode=True,
                            shared_s1=shared_s1)
        return got_text, got_s1

    ref_text, ref_s1 = run(shared_s1=False)
    got_text, got_s1 = run(shared_s1=True)
    assert got_text == ref_text
    assert set(got_s1) == set(ref_s1)
    for k in ref_s1:
        assert len(ref_s1[k]) == len(got_s1[k]) > 0
        for (ri, rt), (gi, gt) in zip(ref_s1[k], got_s1[k]):
            assert ri == gi
            _traj_close(rt, gt)
