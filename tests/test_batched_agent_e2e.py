"""Batched dual-system agent: scheduling parity + full evaluator loop.

The batched agent must reproduce the single InternVLAN1Agent's
scheduling/action semantics per slot exactly (S2 cadence, latent
consumption, S1 micro-step budget, step accounting) — batching is a
throughput transform only. Scheduling is verified bit-exactly against
scripted stub policies (model outputs held constant across both agents);
numerical S2 parity of the real batched policy is covered by
tests/test_serving_batched.py. A second test drives the real small-config
model through VLNBatchedEvaluator end to end on the fake env.
"""

from typing import List, Optional

import numpy as np
import pytest

from __graft_entry__ import _small_n1_config
from internnav_tpu.agent.internvla_n1_agent import (
    BatchedInternVLAN1Agent,
    InternVLAN1Agent,
)
from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg
from internnav_tpu.evaluator import VLNBatchedEvaluator
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.basemodel.internvla_n1.serving import BatchedN1Policy
from internnav_tpu.model.utils.vln_utils import S1Output, S2Output

from tests.test_eval_e2e import make_episodes


# --------------------------------------------------------------- stub policies
class _Script:
    """Deterministic per-slot S2/S1 outputs keyed by call count."""

    def __init__(self, s2_kinds: List[str]):
        self.s2_kinds = s2_kinds  # 'latent' or 'actions'
        self.s2_calls = {0: 0, 1: 0}
        self.s1_calls = {0: 0, 1: 0}

    def s2(self, slot: int) -> S2Output:
        k = self.s2_kinds[self.s2_calls[slot] % len(self.s2_kinds)]
        self.s2_calls[slot] += 1
        if k == "latent":
            return S2Output(output_pixel=np.array([5, 7]),
                            output_latent=np.ones((1, 2, 4)) * slot)
        return S2Output(output_action=[2, 3, 0])

    def s1(self, slot: int) -> S1Output:
        self.s1_calls[slot] += 1
        return S1Output(idx=[1, 1, 3, 2], trajectory=np.zeros((4, 8, 3)))


class _StubSlot:
    def __init__(self):
        self.instruction = ""


class _StubBatchedPolicy:
    def __init__(self, script: _Script, batch: int):
        self.script = script
        self.slots = [_StubSlot() for _ in range(batch)]

    def reset_slot(self, i, instruction):
        self.slots[i].instruction = instruction

    def s2_submit(self, images, max_new_tokens=128, slot_ids=None):
        return {"slot_ids": slot_ids}

    def s2_collect(self, handle):
        return [self.script.s2(i) for i in handle["slot_ids"]]

    def s2_step(self, images, max_new_tokens=128, slot_ids=None):
        return self.s2_collect(self.s2_submit(images, max_new_tokens,
                                              slot_ids))

    def s1_submit(self, rgb, latents, num_sample_trajs=32, slot_ids=None):
        return {"n": rgb.shape[0]}

    def s1_collect(self, handle):
        return [self.script.s1(j) for j in range(handle["n"])]

    def s1_step_latent(self, rgb, latents, num_sample_trajs=32,
                       slot_ids=None):
        return self.s1_collect(self.s1_submit(rgb, latents,
                                              num_sample_trajs, slot_ids))


class _StubSinglePolicy:
    def __init__(self, script: _Script, slot: int):
        self.script = script
        self.slot = slot

    def reset(self):
        pass

    def s2_step(self, rgb, instruction, look_down=False, max_new_tokens=128):
        return self.script.s2(self.slot)

    def s1_step_latent(self, rgb2, depth2, latent, continuous_traj=True,
                       num_sample_trajs=32):
        return self.script.s1(self.slot)


def _obs(seed, t, instr):
    rs = np.random.RandomState(seed * 1000 + t)
    return {
        "rgb": rs.randint(0, 255, (56, 56, 3)).astype(np.uint8),
        "depth": rs.rand(56, 56, 1).astype(np.float32),
        "instruction_text": instr,
    }


@pytest.mark.parametrize("s2_kinds", [["latent"], ["actions"],
                                      ["latent", "actions"]])
def test_batched_agent_scheduling_matches_single(s2_kinds):
    settings = dict(infer_mode="partial_async", sys2_max_forward_step=3,
                    max_local_steps=2, async_s2=False)
    steps = 10
    instr = ["walk to the kitchen", "turn left at the red door"]

    batched = BatchedInternVLAN1Agent(
        AgentCfg(model_name="internvla_n1_batched",
                 model_settings={**settings, "batch_size": 2}),
        policy=_StubBatchedPolicy(_Script(list(s2_kinds)), 2))
    got = {0: [], 1: []}
    for t in range(steps):
        outs = batched.step([_obs(0, t, instr[0]), _obs(1, t, instr[1])])
        for i in range(2):
            got[i].append(outs[i]["action"][0])

    for i in range(2):
        agent = InternVLAN1Agent(
            AgentCfg(model_name="internvla_n1", model_settings=settings),
            policy=_StubSinglePolicy(_Script(list(s2_kinds)), i))
        want = []
        for t in range(steps):
            out = agent.step([_obs(i, t, instr[i])])
            want.append(out[0]["action"][0])
        assert got[i] == want, f"slot {i} ({s2_kinds}): {got[i]} != {want}"


def test_batched_agent_e2e_eval(tmp_path):
    cfg = _small_n1_config()
    single_policy = InternVLAN1Policy.build(cfg, image_hw=56)
    policy = BatchedN1Policy(single_policy.model, single_policy.params, cfg,
                             batch_size=2, tokenizer=single_policy.tokenizer)
    agent = BatchedInternVLAN1Agent(
        AgentCfg(model_name="internvla_n1_batched",
                 model_settings={"batch_size": 2, "max_new_tokens": 4,
                                 "num_sample_trajs": 4, "config": cfg}),
        policy=policy)
    eval_cfg = EvalCfg(
        agent=AgentCfg(model_name="internvla_n1_batched"),
        env=EnvCfg(env_type="fake", env_num=2,
                   env_settings={"rgb_resolution": [56, 56],
                                 "depth_resolution": [56, 56]}),
        task=TaskCfg(max_step=4),
        dataset=EvalDatasetCfg(),
        eval_type="vln_batched",
        output_dir=str(tmp_path / "eval_out"),
    )
    ev = VLNBatchedEvaluator(eval_cfg, episodes=make_episodes(3), agent=agent)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 3
    assert (tmp_path / "eval_out" / "result.json").exists()


def test_pipelined_evaluator_completes_all_episodes(tmp_path):
    """VLNPipelinedEvaluator (2 cohorts, round-robin coroutine scheduler)
    must evaluate every episode and produce the same aggregate metric KEYS
    as the blocking batched evaluator."""
    from internnav_tpu.configs import (
        AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg,
    )
    from internnav_tpu.evaluator import Evaluator
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from tests.test_eval_e2e import make_episodes

    cfg = EvalCfg(
        agent=AgentCfg(model_name="internvla_n1_batched",
                       model_settings={"batch_size": 2, "max_new_tokens": 4,
                                       "num_sample_trajs": 2,
                                       "config": InternVLAN1Config.tiny(
                                           "nextdit_async")}),
        env=EnvCfg(env_type="fake", env_num=2,
                   env_settings={"rgb_resolution": [56, 56],
                                 "depth_resolution": [56, 56],
                                 "cohorts": 2}),
        task=TaskCfg(max_step=3),
        dataset=EvalDatasetCfg(),
        eval_type="vln_pipelined",
        output_dir=str(tmp_path / "pipe"),
    )
    ev = Evaluator.init(cfg, episodes=make_episodes(5))
    metrics = ev.eval()
    assert metrics["num_episodes"] == 5.0, metrics
    for k in ("success", "spl", "osr", "NE", "ndtw"):
        assert k in metrics


def test_pipelined_evaluator_shared_decode_matches(tmp_path):
    """env_settings["shared_decode"]: the pooled grouped decode (one
    decoder weight stream per token for all cohorts) must produce the
    SAME per-episode results as the per-cohort fused path."""
    from internnav_tpu.configs import (
        AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg,
    )
    from internnav_tpu.evaluator import Evaluator
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from tests.test_eval_e2e import make_episodes

    def run(shared, out):
        cfg = EvalCfg(
            agent=AgentCfg(model_name="internvla_n1_batched",
                           model_settings={"batch_size": 2,
                                           "max_new_tokens": 4,
                                           "num_sample_trajs": 2,
                                           "config": InternVLAN1Config.tiny(
                                               "nextdit_async")}),
            env=EnvCfg(env_type="fake", env_num=2,
                       env_settings={"rgb_resolution": [56, 56],
                                     "depth_resolution": [56, 56],
                                     "cohorts": 2,
                                     "shared_decode": shared}),
            task=TaskCfg(max_step=3),
            dataset=EvalDatasetCfg(),
            eval_type="vln_pipelined",
            output_dir=str(tmp_path / out),
        )
        ev = Evaluator.init(cfg, episodes=make_episodes(5))
        return ev.eval()

    ref = run(False, "plain")
    got = run(True, "shared")
    drop = ("wall_clock_s", "action_latency_p50_ms",
            "action_latency_p90_ms", "action_latency_p99_ms",
            "action_latency_mean_ms")  # wall-time metrics, not semantics
    ref = {k: v for k, v in ref.items() if k not in drop}
    got = {k: v for k, v in got.items() if k not in drop}
    assert got == ref, (got, ref)


def test_pipelined_evaluator_shared_s1_matches(tmp_path):
    """env_settings["shared_s1"]: the pooled grouped System-1 (one DiT
    program for every cohort's denoise) must produce the SAME per-episode
    results as per-cohort dispatch — trajectories differ only by GEMM
    float epsilon, which never flips the discretized actions on this
    fixture."""
    from internnav_tpu.configs import (
        AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg,
    )
    from internnav_tpu.evaluator import Evaluator
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from tests.test_eval_e2e import make_episodes

    def run(shared, out):
        cfg = EvalCfg(
            agent=AgentCfg(model_name="internvla_n1_batched",
                           model_settings={"batch_size": 2,
                                           "max_new_tokens": 4,
                                           "num_sample_trajs": 2,
                                           "config": InternVLAN1Config.tiny(
                                               "nextdit_async")}),
            env=EnvCfg(env_type="fake", env_num=2,
                       env_settings={"rgb_resolution": [56, 56],
                                     "depth_resolution": [56, 56],
                                     "cohorts": 2,
                                     "shared_decode": shared,
                                     "shared_s1": shared}),
            task=TaskCfg(max_step=3),
            dataset=EvalDatasetCfg(),
            eval_type="vln_pipelined",
            output_dir=str(tmp_path / out),
        )
        ev = Evaluator.init(cfg, episodes=make_episodes(5))
        return ev.eval()

    ref = run(False, "plain_s1")
    got = run(True, "shared_s1")
    drop = ("wall_clock_s", "action_latency_p50_ms",
            "action_latency_p90_ms", "action_latency_p99_ms",
            "action_latency_mean_ms")  # wall-time metrics, not semantics
    ref = {k: v for k, v in ref.items() if k not in drop}
    got = {k: v for k, v in got.items() if k not in drop}
    assert got == ref, (got, ref)


def test_pipelined_evaluator_shared_s1_navdp_matches(tmp_path):
    """NavDP cohorts in the flagship shared-grouped topology THROUGH THE
    PRODUCT LOOP: with env_settings["shared_s1"], the batched agent's navdp
    branch must pool its spec (serving.s1_grouped_dispatch navdp bucket)
    rather than silently falling back to per-cohort dispatch, and the
    per-episode results must match per-cohort dispatch (the grouped DDPM
    program replays each cohort's own x_init + step-noise draws
    bit-equally; trajectories differ only by GEMM epsilon, which never
    flips the discretized actions on this fixture)."""
    from internnav_tpu.configs import (
        AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg,
    )
    from internnav_tpu.evaluator import Evaluator
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from tests.test_eval_e2e import make_episodes

    def run(shared, out):
        cfg = EvalCfg(
            agent=AgentCfg(model_name="internvla_n1_batched",
                           model_settings={"batch_size": 2,
                                           "max_new_tokens": 4,
                                           "num_sample_trajs": 2,
                                           "config": InternVLAN1Config.tiny(
                                               "navdp_async")}),
            env=EnvCfg(env_type="fake", env_num=2,
                       env_settings={"rgb_resolution": [56, 56],
                                     "depth_resolution": [56, 56],
                                     "cohorts": 2,
                                     "shared_decode": shared,
                                     "shared_s1": shared}),
            task=TaskCfg(max_step=3),
            dataset=EvalDatasetCfg(),
            eval_type="vln_pipelined",
            output_dir=str(tmp_path / out),
        )
        ev = Evaluator.init(cfg, episodes=make_episodes(5))
        return ev, ev.eval()

    _, ref = run(False, "plain_navdp")
    ev_got, got = run(True, "shared_navdp")
    # the grouped navdp program must actually have run — without this the
    # parity assert passes trivially if the agent falls back to per-cohort
    grouped_keys = [k for k in ev_got.agent.policy.inner._jit_cache
                    if k.startswith("s1G_navdp")]
    assert grouped_keys, list(ev_got.agent.policy.inner._jit_cache)
    drop = ("wall_clock_s", "action_latency_p50_ms",
            "action_latency_p90_ms", "action_latency_p99_ms",
            "action_latency_mean_ms")  # wall-time metrics, not semantics
    ref = {k: v for k, v in ref.items() if k not in drop}
    got = {k: v for k, v in got.items() if k not in drop}
    assert got == ref, (got, ref)
