"""End-to-end evaluation tests on the fake env.

Covers the reference's two strong test patterns (SURVEY.md §4):
- full evaluator loop producing metrics,
- run-twice resume ("no more episodes" on second pass),
plus the batched-agent recurrent state bookkeeping the reference never
unit-tests.
"""

import numpy as np
import pytest

from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg
from internnav_tpu.env import Episode, FakeEnv
from internnav_tpu.evaluator import Evaluator, VLNBatchedEvaluator


def make_episodes(n=3, path_len=4):
    eps = []
    for i in range(n):
        ref = np.stack([np.linspace(0, 1 + i, path_len), np.zeros(path_len), np.zeros(path_len)], 1)
        eps.append(
            Episode(
                episode_id=str(i),
                trajectory_id=f"t{i}",
                scene_id="scene0",
                instruction_text=f"walk forward {i}",
                instruction_tokens=np.asarray([2, 3, 4 + i], np.int32),
                start_position=np.zeros(3),
                start_rotation=np.asarray([1.0, 0, 0, 0]),
                reference_path=ref,
                geodesic_distance=float(1 + i),
            )
        )
    return eps


def small_eval_cfg(tmp_path, env_num=2, max_step=6, model="simple"):
    return EvalCfg(
        agent=AgentCfg(model_name=model, model_settings={"mode": "fixed", "action": 1}),
        env=EnvCfg(env_type="fake", env_num=env_num,
                   env_settings={"rgb_resolution": [64, 64], "depth_resolution": [64, 64]}),
        task=TaskCfg(max_step=max_step),
        dataset=EvalDatasetCfg(),
        eval_type="vln_batched",
        output_dir=str(tmp_path / "eval_out"),
    )


def test_fake_env_kinematics():
    env = FakeEnv(EnvCfg(env_type="fake", env_num=1), TaskCfg(max_step=10),
                  episodes=make_episodes(1))
    obs = env.reset()
    assert obs[0]["steps"] == 0
    # forward 4 times: x advances 0.25 each
    for k in range(4):
        obs = env.step([1])
    np.testing.assert_allclose(obs[0]["globalgps"][0], 1.0, atol=1e-6)
    # turn left then forward: moves along +y
    env.step([2])
    for _ in range(2):
        obs = env.step([1])
    assert obs[0]["globalgps"][1] > 0.1
    obs = env.step([0])  # stop
    assert obs[0]["done"]
    res = env.episode_results[0]
    assert res["steps"] == 8
    assert res["TL"] > 0


def test_eval_loop_fixed_agent(tmp_path):
    cfg = small_eval_cfg(tmp_path)
    ev = VLNBatchedEvaluator(cfg, episodes=make_episodes(3))
    metrics = ev.eval()
    assert metrics["num_episodes"] == 3
    assert metrics["steps"] == 6  # fixed-forward agent always exhausts max_step
    assert 0.0 <= metrics["ndtw"] <= 1.0
    assert (tmp_path / "eval_out" / "result.json").exists()


def test_eval_resume_skips_done(tmp_path):
    cfg = small_eval_cfg(tmp_path)
    ev1 = VLNBatchedEvaluator(cfg, episodes=make_episodes(3))
    m1 = ev1.eval()
    assert m1["num_episodes"] == 3
    # second run: everything resumes from the store, env starts exhausted
    ev2 = VLNBatchedEvaluator(cfg, episodes=make_episodes(3))
    # resume store must filter all episodes out ("no more episodes")
    assert len(ev2.env.episodes) == 0
    m2 = ev2.eval()
    assert m2["num_episodes"] == 3
    assert m2["success"] == m1["success"]


@pytest.mark.slow
def test_eval_loop_cma_agent(tmp_path):
    """Full policy-in-the-loop eval with an untrained CMA (shape/flow test)."""
    cfg = small_eval_cfg(tmp_path, env_num=2, max_step=3, model="cma")
    ev = VLNBatchedEvaluator(cfg, episodes=make_episodes(2))
    metrics = ev.eval()
    assert metrics["num_episodes"] == 2


@pytest.mark.slow
def test_seq2seq_agent_batch_state(tmp_path):
    """Recurrent agent keeps independent per-env state and resets slices
    (slow tier: the real policy step compiles ~35 s; the slice logic has
    a compile-free fast variant below)."""
    from internnav_tpu.agent import Seq2SeqAgent

    agent = Seq2SeqAgent(AgentCfg(model_name="seq2seq"))
    obs = [
        {
            "rgb": np.zeros((64, 64, 3), np.uint8),
            "depth": np.zeros((64, 64, 1), np.float32),
            "instruction": np.asarray([2, 3], np.int32),
        }
        for _ in range(2)
    ]
    out1 = agent.step(obs)
    assert len(out1) == 2 and "action" in out1[0]
    s_before = agent._states.copy()
    assert np.abs(s_before).sum() > 0
    agent.reset([0])
    assert np.abs(agent._states[0]).sum() == 0
    assert np.abs(agent._states[1]).sum() > 0


def test_seq2seq_agent_reset_slices_fast():
    """Compile-free variant of the per-env state reset: slices zero
    independently (full step parity stays in the slow variant)."""
    from internnav_tpu.agent import Seq2SeqAgent

    agent = Seq2SeqAgent(AgentCfg(model_name="seq2seq"))
    agent._states = np.ones((2, agent.num_layers, agent.hidden_size),
                            np.float32)
    agent._prev_actions = np.ones((2, 1), np.int32)
    agent._not_done = np.ones((2, 1), np.float32)
    agent.reset([0])
    assert np.abs(agent._states[0]).sum() == 0
    assert np.abs(agent._states[1]).sum() > 0
    agent.reset()
    assert np.abs(agent._states).sum() == 0


def test_pipelined_eval_resume_skips_done(tmp_path):
    """Run-twice resume (the reference's signature eval test,
    SURVEY.md §4) for the dual-cohort pipelined evaluator: the second run
    finds every episode in the store and reports the same aggregate."""
    from internnav_tpu.evaluator import VLNPipelinedEvaluator

    cfg = small_eval_cfg(tmp_path)
    cfg.env.env_settings = dict(cfg.env.env_settings or {}, cohorts=2)
    cfg.eval_type = "vln_pipelined"
    m1 = VLNPipelinedEvaluator(cfg, episodes=make_episodes(4)).eval()
    assert m1["num_episodes"] == 4
    ev2 = VLNPipelinedEvaluator(cfg, episodes=make_episodes(4))
    assert len(ev2.env.episodes) == 0  # all resumed from the store
    m2 = ev2.eval()
    assert m2["num_episodes"] == 4
    assert m2["success"] == m1["success"]


def test_pipelined_eval_barrier_form_parity(tmp_path):
    """overlap_apply=False (the pre-overlap barrier form, kept as an A-B
    measurement lever for bench.py --no-overlap) must produce identical
    per-episode results to the default overlapped scheduler."""
    from internnav_tpu.evaluator import VLNPipelinedEvaluator

    results = {}
    for name, overlap in (("on", True), ("off", False)):
        cfg = small_eval_cfg(tmp_path / name)
        cfg.env.env_settings = dict(cfg.env.env_settings or {},
                                    cohorts=2, overlap_apply=overlap)
        cfg.eval_type = "vln_pipelined"
        results[name] = VLNPipelinedEvaluator(
            cfg, episodes=make_episodes(4)).eval()
    drop = {"wall_clock_s", "actions_timed", "action_latency_p50_ms",
            "action_latency_p90_ms", "action_latency_p99_ms",
            "action_latency_mean_ms", "actions_per_sec"}
    a = {k: v for k, v in results["on"].items() if k not in drop}
    b = {k: v for k, v in results["off"].items() if k not in drop}
    assert a == b


def test_pipelined_eval_cma_agent(tmp_path):
    """Pipelined dual-cohort eval with the recurrent CMA agent (its
    step_coroutine overlap path)."""
    from internnav_tpu.evaluator import VLNPipelinedEvaluator

    cfg = small_eval_cfg(tmp_path, env_num=2, max_step=3, model="cma")
    cfg.env.env_settings = dict(cfg.env.env_settings or {}, cohorts=2)
    cfg.eval_type = "vln_pipelined"
    m = VLNPipelinedEvaluator(cfg, episodes=make_episodes(4)).eval()
    assert m["num_episodes"] == 4
