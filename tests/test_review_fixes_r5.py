"""Regression tests for the round-4 advisor findings (fixed in round 5).

- VLNPEBatchAdapter partial resets against the REAL InternUtopia reset
  contract: `env.reset(env_ids)` answers with reset-envs-only lists
  positionally aligned to env_ids (reference
  vln_distributed_evaluator.py:234-240 assigns
  ``reset_infos[reset_env_ids] = new_reset_infos``), not the full-length
  lists FakePhysicsVecEnv returns. Slot-id indexing IndexErrors or binds
  path_keys to the wrong slots.
- Partial-reset slots enter WARM_UP (reference :235) and stand still
  until their finish_action arrives, then flip to NORMAL (reference
  terminate_ops :194-197) — they must not hand the agent an unsettled
  first frame or apply the agent's stale action.
- The evaluator feeds fake obs for warming slots (reference :130-137)
  and resets the agent slot once warm-up completes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from internnav_tpu.configs.evaluator import EnvCfg, TaskCfg
from internnav_tpu.env.internutopia.batch_adapter import VLNPEBatchAdapter
from internnav_tpu.env.internutopia.env import InternutopiaEnv
from tests.test_vlnpe import _episode as vlnpe_episode


class _PositionalResetEnv:
    """Speaks the REAL InternUtopia partial-reset contract: reset(env_ids)
    returns len(env_ids) obs/infos positionally aligned to env_ids. Also
    hides render_frames — real Isaac cannot render pre-settle."""

    def __init__(self, inner: InternutopiaEnv) -> None:
        self._inner = inner
        self.env_num = inner.env_num

    def reset(self, env_ids=None):
        obs, infos = self._inner.reset(env_ids)
        if env_ids is None:
            return obs, infos
        return [obs[i] for i in env_ids], [infos[i] for i in env_ids]

    def step(self, actions):
        return self._inner.step(actions)

    def get_observation(self):
        return self._inner.get_observation()

    def close(self):
        self._inner.close()


def _make_adapter(n_eps: int = 6, env_num: int = 2, max_step: int = 3):
    eps = [vlnpe_episode(i) for i in range(n_eps)]
    env = InternutopiaEnv(
        EnvCfg(env_type="internutopia",
               env_settings={"backend": "fake_physics"}, env_num=env_num),
        TaskCfg(max_step=max_step, warm_up_step=1, robot_flash=True,
                camera_resolution=[24, 24]),
        episodes=eps)
    ad = VLNPEBatchAdapter(_PositionalResetEnv(env), robot_name="h1",
                           robot_flash=True, episodes=eps, rgb_hw=(24, 24))
    return ad, env


def _run_slot0_to_done(ad) -> List[Optional[Dict[str, Any]]]:
    obs = ad.reset()
    for _ in range(8):
        obs = ad.step([1, -1])
        if obs[0] is not None and obs[0]["done"]:
            return obs
    raise AssertionError("slot 0 never finished")


def test_partial_reset_positional_infos_bind_right_slots():
    ad, env = _make_adapter()
    _run_slot0_to_done(ad)
    key1_before = ad._path_keys[1]
    obs2 = ad.reset([0])  # positional single-entry lists from the env
    assert isinstance(ad._path_keys[0], str) and ad._path_keys[0]
    # the live slot's episode binding is untouched by slot 0's re-reset
    assert ad._path_keys[1] == key1_before
    assert obs2[0] is not None and obs2[0]["path_key"] == ad._path_keys[0]
    assert obs2[1] is not None and obs2[1]["path_key"] == key1_before


def test_partial_reset_enters_warm_up_and_discards_agent_action():
    ad, env = _make_adapter()
    _run_slot0_to_done(ad)
    obs2 = ad.reset([0])
    # reference :235 — freshly reset slots warm up, they are not NORMAL
    assert obs2[0]["warming_up"] is True
    assert obs2[1]["warming_up"] is False
    pose0 = env.env.slots[0].pose.copy()
    obs3 = ad.step([3, 1])  # agent's action 3 for the warming slot ...
    # ... is replaced by stand_still: the robot has not moved
    np.testing.assert_allclose(env.env.slots[0].pose[:2], pose0[:2])
    # finish_action arrived during the macro-step -> flipped to NORMAL
    assert obs3[0] is not None and obs3[0]["warming_up"] is False
    assert not obs3[0]["done"]
    # next macro-step the new episode really moves
    obs4 = ad.step([2, 1])
    assert obs4[0] is not None and not obs4[0]["warming_up"]


def test_partial_reset_positional_obs_keep_live_frames():
    ad, env = _make_adapter()
    obs = _run_slot0_to_done(ad)
    live_rgb = np.asarray(obs[1]["rgb"])
    assert live_rgb.any()
    obs2 = ad.reset([0])
    # live slot keeps its last real capture even though the env answered
    # with a single-entry positional obs list
    assert np.array_equal(np.asarray(obs2[1]["rgb"]), live_rgb)


# --------------------------------------------- evaluator warm-up protocol
class _ScriptEnv:
    """Obs-list protocol env scripted to: step0 finishes slot 0, the
    partial reset warms it up, the next step completes warm-up."""

    def __init__(self) -> None:
        self.episode_results: List[Dict[str, Any]] = []
        self.t = 0

    def _obs(self, key, done=False, warming=False):
        return {"rgb": np.zeros((4, 4, 3), np.uint8), "path_key": key,
                "done": done, "warming_up": warming}

    @property
    def is_running(self) -> bool:
        return self.t < 4

    def reset(self, env_ids=None):
        if env_ids is None:
            return [self._obs("a"), self._obs("b")]
        assert env_ids == [0]
        return [self._obs("c", warming=True), self._obs("b")]

    def step(self, actions):
        self.t += 1
        if self.t == 1:
            self.episode_results.append({"path_key": "a", "success": True})
            return [self._obs("a", done=True), self._obs("b")]
        if self.t == 2:  # warm-up macro-step: slot 0 settles
            return [self._obs("c"), self._obs("b")]
        return [self._obs("c"), self._obs("b")]

    def close(self):
        pass


class _RecordingAgent:
    def __init__(self) -> None:
        self.resets: List[List[int]] = []
        self.seen: List[List[Dict[str, Any]]] = []

    def step(self, batch):
        self.seen.append(batch)
        return [{"action": [1]} for _ in batch]

    def reset(self, ids=None):
        self.resets.append(list(ids) if ids is not None else [])


def test_cohort_runner_warm_up_feeds_fake_obs_and_resets_agent(tmp_path):
    from internnav_tpu.evaluator.vln_pipelined_evaluator import _Cohort as CohortRunner
    from internnav_tpu.evaluator.utils.data_collector import (
        EpisodeResultStore,
    )

    class _Progress:
        def start(self, *a, **k): pass
        def step(self, *a, **k): pass
        def end(self, *a, **k): pass

    fake = {"rgb": np.zeros((4, 4, 3), np.uint8), "path_key": "",
            "done": True}
    env, agent = _ScriptEnv(), _RecordingAgent()
    store = EpisodeResultStore(str(tmp_path / "res"))
    r = CohortRunner(0, env, agent, _Progress(), store)
    r.start()
    b = r.build_batch(lambda: fake)
    r.apply(agent.step(b))               # t=1: slot 0 done -> reset([0])
    assert agent.resets and agent.resets[-1] == [0]
    b = r.build_batch(lambda: fake)
    assert b[0] is fake                  # warming slot sees fake obs
    assert b[1]["path_key"] == "b"
    n_resets = len(agent.resets)
    r.apply(agent.step(b))               # t=2: warm-up completes
    # agent slot 0 state (polluted by fake obs) reset at warm-up end
    assert agent.resets[n_resets:] == [[0]]
    b = r.build_batch(lambda: fake)
    assert b[0]["path_key"] == "c"       # real obs from here on
