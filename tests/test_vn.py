"""VN pointgoal benchmark tests (NavDP agent + kinematic obstacle env)."""

import numpy as np
import pytest

from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
from internnav_tpu.evaluator.vn_evaluator import (
    VNEpisode,
    VNPointGoalEvaluator,
    make_cluttered_episodes,
)


def test_make_cluttered_episodes():
    eps = make_cluttered_episodes(n=3, seed=1)
    assert len(eps) == 3
    for ep in eps:
        assert not ep.blocked(ep.start_xy)
        assert not ep.blocked(ep.goal_xy)
        assert ep.occupancy.any()


def test_vn_evaluator_with_oracle_agent(tmp_path):
    """An oracle waypoint agent must reach the goal → SR 1.0, SPL ~1."""
    from internnav_tpu.agent.base import Agent

    class OracleAgent(Agent):
        def __init__(self):
            pass

        def reset(self, reset_index=None):
            pass

        def step(self, obs):
            goal = np.asarray(obs[0]["pointgoal"])  # agent-frame
            step = goal[:2]
            n = np.linalg.norm(step)
            if n > 0.3:
                step = step / n * 0.3
            return [{"action": [1], "waypoint": [float(step[0]), float(step[1]), 0.0]}]

    eps = [VNEpisode(episode_id="0", start_xy=np.asarray([0.5, 3.0]),
                     goal_xy=np.asarray([4.0, 3.0]), geodesic=3.5)]
    cfg = EvalCfg(agent=AgentCfg(model_name="simple"),
                  env=EnvCfg(env_type="fake",
                             env_settings={"rgb_resolution": [32, 32]}),
                  task=TaskCfg(max_step=40), eval_type="vn_pointgoal",
                  output_dir=str(tmp_path))
    ev = VNPointGoalEvaluator(cfg, episodes=eps, agent=OracleAgent())
    m = ev.eval()
    assert m["success"] == 1.0
    assert m["spl"] > 0.9


@pytest.mark.slow
def test_vn_evaluator_with_navdp_agent(tmp_path):
    from internnav_tpu.agent import Agent
    from internnav_tpu.configs import AgentCfg

    agent = Agent.init(AgentCfg(model_name="navdp", model_settings={
        "image_size": 28, "memory_size": 2, "predict_size": 6,
        "temporal_depth": 1, "sample_num": 2, "replan_every": 3,
    }))
    eps = [VNEpisode(episode_id="0", start_xy=np.asarray([0.5, 3.0]),
                     goal_xy=np.asarray([2.0, 3.0]), geodesic=1.5)]
    cfg = EvalCfg(agent=AgentCfg(model_name="simple"),
                  env=EnvCfg(env_type="fake",
                             env_settings={"rgb_resolution": [28, 28]}),
                  task=TaskCfg(max_step=5), eval_type="vn_pointgoal",
                  output_dir=str(tmp_path))
    ev = VNPointGoalEvaluator(cfg, episodes=eps, agent=agent)
    m = ev.eval()  # untrained policy: flow runs, metrics exist
    assert "success" in m and m["num_episodes"] == 1
