"""Dialog (VL-LN / IIGN) evaluator — NPC-in-the-loop navigation.

Reference parity: internnav/habitat_extensions/vlln/
habitat_dialog_evaluator.py:37-120 — the agent may ask the NPC questions
mid-episode (an 'ask' action), the NPC answers from goal annotations, and
metrics additionally track the question count. Built on the sim-agnostic
HabitatVLNEvaluator loop with the DialogAgent driving steps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from internnav_tpu.dialog.dialog_agent import DialogAgent
from internnav_tpu.dialog.npc import SimpleNPC
from internnav_tpu.env.episodes import Episode
from internnav_tpu.evaluator.base import Evaluator
from internnav_tpu.habitat.measures import compute_all

ASK_ACTION = 4


@Evaluator.register("habitat_dialog")
class HabitatDialogEvaluator(Evaluator):
    def __init__(self, cfg, sim=None, episodes: Optional[List[Episode]] = None,
                 agent: Optional[DialogAgent] = None, **kwargs):
        from internnav_tpu.habitat.sim_adapter import FakeSim

        self.sim = sim if sim is not None else FakeSim()
        self.episodes = list(episodes or [])
        kwargs.setdefault("env", _Null())
        super().__init__(cfg, agent=agent, **kwargs)

    def eval_action(self) -> List[Dict[str, Any]]:
        results = []
        for ep in self.episodes:
            results.append(self._run_episode(ep))
        return results

    def _run_episode(self, ep: Episode) -> Dict[str, Any]:
        obs = self.sim.reset(ep)
        self.agent.reset()
        goal_info = ep.extra.get("goal_info")
        if goal_info and isinstance(self.agent, DialogAgent):
            self.agent.npc.reset(goal_info)
        trajectory = [np.asarray(self.sim.position)]
        questions = 0
        steps = 0
        while steps < self.cfg.task.max_step and not self.sim.episode_over:
            o = dict(obs)
            o["instruction_text"] = ep.instruction_text
            o["globalgps"] = np.asarray(self.sim.position)
            o["yaw"] = float(getattr(self.sim, "yaw", 0.0))
            out = self.agent.step([o])[0]
            a = int(out["action"][0])
            if a == ASK_ACTION:
                questions += 1
                steps += 1
                continue  # asking consumes a step but no motion
            obs = self.sim.step(a)
            trajectory.append(np.asarray(self.sim.position))
            steps += 1
            if a == 0:
                break
        rec = compute_all(np.asarray(trajectory), ep.reference_path,
                          ep.geodesic_distance,
                          self.cfg.task.metric_config.success_distance)
        rec["questions"] = float(questions)
        rec["episode_id"] = ep.episode_id
        rec["split"] = ep.split
        return rec


class _Null:
    is_running = True

    def close(self):
        pass
