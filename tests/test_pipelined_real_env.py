"""Multi-cohort pipelined evaluator against real (non-fake) sim backends.

Closes the vln_pipelined fake-env-only limitation: two FakePhysics VLN-PE
cohorts (env_type="internutopia") run behind VLNPEBatchAdapter, and the
per-episode metrics match the blocking VLNPEEvaluator bit-for-bit on the
same episodes and the same deterministic agent. Also covers the
env_factory constructor hook.
"""

from __future__ import annotations

import numpy as np

from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.configs.evaluator import EnvCfg, EvalCfg, TaskCfg
from internnav_tpu.evaluator import Evaluator
from tests.test_vlnpe import _episode


def _cfg(tmp_path, sub: str, eval_type: str, cohorts: int = 2,
         env_num: int = 2):
    return EvalCfg(
        agent=AgentCfg(model_name="simple",
                       model_settings={"mode": "fixed", "action": 1}),
        env=EnvCfg(env_type="internutopia",
                   env_settings={"backend": "fake_physics",
                                 "cohorts": cohorts},
                   env_num=env_num),
        task=TaskCfg(max_step=4, warm_up_step=2, robot_flash=True,
                     camera_resolution=[32, 32]),
        eval_type=eval_type,
        output_dir=str(tmp_path / sub),
    )


def _by_episode(results):
    return {str(r["episode_id"]): r for r in results}


def test_pipelined_two_fake_physics_cohorts_match_vlnpe(tmp_path):
    """2 cohorts x 2 envs of FakePhysics VLN-PE through the coroutine
    scheduler produce the SAME per-episode metrics as the blocking
    VLNPEEvaluator (same episodes, same fixed-forward agent).

    Episode count equals the total slot count (4 = 2 cohorts x 2 envs =
    1 ref env group of 4) so every episode is first-assigned and pays the
    same warm-up burn — which episodes warm up is an episode->slot
    assignment artifact in the reference FSM too, not a protocol
    property, so slot-rotation runs can't be compared per-episode."""
    eps = [_episode(i) for i in range(4)]

    ref_ev = Evaluator.init(_cfg(tmp_path, "ref", "vln_pe", env_num=4),
                            episodes=eps)
    ref_metrics = ref_ev.eval()
    ref_by_ep = _by_episode(ref_ev.results)
    assert ref_metrics["num_episodes"] == 4

    pipe_ev = Evaluator.init(_cfg(tmp_path, "pipe", "vln_pipelined"),
                             episodes=eps)
    pipe_metrics = pipe_ev.eval()
    assert pipe_metrics["num_episodes"] == 4
    for k in ("success", "spl", "osr", "NE"):
        assert k in pipe_metrics
    # p50/p99 per-action latency (BASELINE.md's named observable)
    for k in ("action_latency_p50_ms", "action_latency_p99_ms",
              "action_latency_mean_ms"):
        assert pipe_metrics[k] > 0
    assert pipe_metrics["actions_timed"] > 0

    # the cohorts each built their own InternutopiaEnv behind the adapter
    from internnav_tpu.env.internutopia.batch_adapter import VLNPEBatchAdapter

    assert pipe_ev._prebuilt_envs is not None
    assert len(pipe_ev._prebuilt_envs) == 2
    assert all(isinstance(e, VLNPEBatchAdapter)
               for e in pipe_ev._prebuilt_envs)

    pipe_results = []
    for rec in pipe_ev.store.records():
        if rec.get("info"):
            pipe_results.append(rec["info"])
    pipe_by_ep = _by_episode(pipe_results)
    assert set(pipe_by_ep) == set(ref_by_ep)
    for ep_id, ref_m in ref_by_ep.items():
        got = pipe_by_ep[ep_id]
        for k in ("success", "NE", "spl", "osr", "TL", "steps"):
            assert np.isclose(float(got[k]), float(ref_m[k])), (
                ep_id, k, got[k], ref_m[k])


def test_pipelined_real_env_slot_rotation_completes(tmp_path):
    """More episodes than slots: the cohorts rotate episodes through their
    slots (re-reset straight to NORMAL, like the reference terminate_ops)
    and still complete the full shard."""
    eps = [_episode(i) for i in range(7)]
    ev = Evaluator.init(_cfg(tmp_path, "rot", "vln_pipelined"), episodes=eps)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 7
    done_keys = {str((rec.get("info") or {}).get("episode_id"))
                 for rec in ev.store.records()}
    assert done_keys == {str(i) for i in range(7)}


def test_pipelined_real_env_resume(tmp_path):
    """Second run over the same output_dir resumes from the store: zero
    episodes re-simulated, identical aggregate metrics."""
    eps = [_episode(i) for i in range(4)]
    cfg = _cfg(tmp_path, "resume", "vln_pipelined")
    m1 = Evaluator.init(cfg, episodes=eps).eval()
    ev2 = Evaluator.init(cfg, episodes=eps)
    # every cohort env should see an empty pending share
    assert all(len(e.episodes) == 0 for e in ev2._prebuilt_envs)
    m2 = ev2.eval()
    assert m2["num_episodes"] == m1["num_episodes"] == 4
    assert m2["success"] == m1["success"]


def test_pipelined_env_factory_hook(tmp_path):
    """env_factory wins over the default cohort-env builder and receives
    (idx, env_cfg, task_cfg, episode_share)."""
    from internnav_tpu.env.internutopia.batch_adapter import VLNPEBatchAdapter
    from internnav_tpu.env.internutopia.env import InternutopiaEnv

    eps = [_episode(i) for i in range(4)]
    calls = []

    def factory(idx, env_cfg, task_cfg, share):
        calls.append((idx, len(share)))
        env = InternutopiaEnv(env_cfg, task_cfg, episodes=share)
        return VLNPEBatchAdapter(env, robot_name=task_cfg.robot_name,
                                 robot_flash=task_cfg.robot_flash,
                                 episodes=share,
                                 rgb_hw=task_cfg.camera_resolution)

    cfg = _cfg(tmp_path, "factory", "vln_pipelined")
    ev = Evaluator.init(cfg, episodes=eps, env_factory=factory)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 4
    assert sorted(c[0] for c in calls) == [0, 1]
    assert sum(c[1] for c in calls) == 4
