"""Golden-tape habitat contract test.

Drives HabitatVLNEvaluator's consumer path with a sim that enforces real
habitat semantics and serves observations in habitat's EXACT schema:
- obs keys 'rgb' (H, W, 3) uint8 and 'depth' (H, W, 1) float32 in [0, 1];
- only registered action ids are legal (stop/forward/left/right/look);
- stepping a finished episode raises (habitat.Env behavior);
- the look-down capture protocol must be balanced LOOKDOWN x2 / LOOKUP x2.

This is the interface-rot tripwire the round-1 verdict asked for
(the adapter itself can only run with habitat installed; this pins the
contract our side must keep satisfying). Also covers the registered
'habitat' Env backend (reference internnav/env/habitat_env.py:9-115).
"""

import numpy as np
import pytest


LEGAL_ACTIONS = {0, 1, 2, 3, 5, 6}
LOOKDOWN, LOOKUP = 5, 6


def _episode(i: int):
    from internnav_tpu.env.episodes import Episode

    ref = np.array([[0, 0, 0], [1.0, 0, 0], [1.5, 0.5, 0]])
    return Episode(
        episode_id=str(i), trajectory_id=str(i), scene_id="sc0",
        instruction_text="go forward and stop",
        instruction_tokens=np.arange(4),
        start_position=np.zeros(3), start_rotation=np.array([1.0, 0, 0, 0]),
        reference_path=ref, geodesic_distance=1.8,
    )


class HabitatTapeSim:
    """Habitat-schema sim with habitat's legality rules + an action log."""

    def __init__(self, hw=(224, 224), max_steps=60):
        self.hw = hw
        self.max_steps = max_steps
        self.action_log = []
        self.reset_count = 0

    def reset(self, episode):
        self.reset_count += 1
        self.ep = episode
        self.pose = np.array([*np.asarray(episode.start_position[:2],
                                          np.float64), 0.0])
        self.pitch = 0.0
        self.steps = 0
        self._over = False
        return self._obs()

    @property
    def position(self):
        return np.array([self.pose[0], self.pose[1], 0.0])

    @property
    def yaw(self):
        return float(self.pose[2])

    @property
    def episode_over(self):
        return self._over

    def step(self, action):
        a = int(action)
        assert a in LEGAL_ACTIONS, f"illegal habitat action id {a}"
        assert not self._over, "habitat raises when stepping a finished episode"
        self.action_log.append(a)
        if a == 1:
            self.pose[0] += 0.25 * np.cos(self.pose[2])
            self.pose[1] += 0.25 * np.sin(self.pose[2])
        elif a == 2:
            self.pose[2] += np.radians(15)
        elif a == 3:
            self.pose[2] -= np.radians(15)
        elif a == LOOKDOWN:
            self.pitch -= np.radians(30)
        elif a == LOOKUP:
            self.pitch += np.radians(30)
        self.steps += 1
        if a == 0 or self.steps >= self.max_steps:
            self._over = True
        return self._obs()

    def _obs(self):
        # EXACT habitat VLN-CE observation schema
        h, w = self.hw
        rs = np.random.RandomState(int(abs(self.pose[0] * 7 + self.pose[1] * 13
                                           + self.pose[2] * 3)) % 997)
        return {
            "rgb": rs.randint(0, 255, (h, w, 3), dtype=np.uint8),
            "depth": rs.uniform(0, 1, (h, w, 1)).astype(np.float32),
            "instruction": {"text": self.ep.instruction_text,
                            "tokens": [1, 2, 3], "trajectory_id": 0},
        }

    def get_metrics(self):
        # habitat measure-key schema
        d = float(np.linalg.norm(self.pose[:2]
                                 - np.asarray(self.ep.reference_path[-1][:2])))
        return {"distance_to_goal": d, "success": float(d < 3.0),
                "spl": float(d < 3.0) * 0.9, "ndtw": 0.5,
                "path_length": 0.25 * self.steps, "oracle_success": 1.0,
                "steps_taken": self.steps,
                "collisions": {"count": 0, "is_collision": False},
                "top_down_map": None}


def _assert_balanced_looks(log):
    """Every LOOKDOWN x2 run must be followed (eventually, before any base
    move) by LOOKUP x2 — the reference's capture protocol (:349-368)."""
    i = 0
    while i < len(log):
        if log[i] == LOOKDOWN:
            assert log[i:i + 2] == [LOOKDOWN, LOOKDOWN], log[i:i + 2]
            assert log[i + 2:i + 4] == [LOOKUP, LOOKUP], log[i + 2:i + 4]
            i += 4
        else:
            i += 1


@pytest.mark.slow
def test_dual_system_evaluator_on_habitat_tape(tmp_path):
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.evaluator import Evaluator
    from internnav_tpu.habitat.evaluator import HabitatVLNEvaluator  # noqa: F401
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

    sim = HabitatTapeSim()
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit"), image_hw=56)
    cfg = EvalCfg(
        agent=AgentCfg(model_name="simple"),
        env=EnvCfg(env_type="habitat"),
        task=TaskCfg(max_step=12),
        eval_type="habitat_vln",
        eval_settings={"mode": "dual_system"},
        output_dir=str(tmp_path / "out"),
    )
    ev = Evaluator.init(cfg, sim=sim, episodes=[_episode(0), _episode(1)],
                        policy=pol)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 2
    assert sim.reset_count == 2
    assert set(sim.action_log) <= LEGAL_ACTIONS
    _assert_balanced_looks(sim.action_log)

    # resume: progress.json replay skips both episodes but keeps the counts
    sim2 = HabitatTapeSim()
    ev2 = Evaluator.init(cfg, sim=sim2, episodes=[_episode(0), _episode(1)],
                         policy=pol)
    metrics2 = ev2.eval()
    assert metrics2["num_episodes"] == 2
    assert sim2.reset_count == 0  # nothing re-run


def test_habitat_env_registry_contract(tmp_path):
    """The registered 'habitat' Env: reset iteration, 4-tuple step with
    habitat metric keys in info, progress resume-skip."""
    from internnav_tpu.configs import EnvCfg, TaskCfg
    from internnav_tpu.env import Env
    import internnav_tpu.habitat.env  # noqa: F401 (registration)

    sim = HabitatTapeSim()
    env = Env.init(
        EnvCfg(env_type="habitat", env_settings={"sim": sim}),
        TaskCfg(camera_resolution=[224, 224]),
    )
    env.episodes = [_episode(0), _episode(1)]
    obs = env.reset()
    assert obs["rgb"].dtype == np.uint8 and obs["depth"].shape[-1] == 1
    obs, reward, done, info = env.step([1])
    assert not done and "distance_to_goal" in info and "spl" in info
    obs, reward, done, info = env.step(0)
    assert done
    assert env.reset() is not None  # second episode
    assert env.reset() is None and not env.is_running  # exhausted

    # progress resume-skip (reference habitat_env.py:56-64)
    import json

    pp = tmp_path / "progress.json"
    with open(pp, "w") as f:
        f.write(json.dumps({"episode_id": "0"}) + "\n")
    env2 = Env.init(
        EnvCfg(env_type="habitat",
               env_settings={"sim": HabitatTapeSim(),
                             "progress_path": str(pp)}),
        TaskCfg(),
    )
    env2.episodes = [e for e in [_episode(0), _episode(1)]
                     if e.episode_id not in env2._done_ids(str(pp))]
    assert [e.episode_id for e in env2.episodes] == ["1"]
