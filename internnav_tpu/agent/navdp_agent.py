"""NavDP agent — goal-conditioned visual-navigation inference.

The reference evaluates NavDP inside the InternUtopia VN benchmark
(BASELINE.md ClutteredEnv / InternScenes rows) without a standalone agent
class; this agent packages the same inference contract for the framework's
env/evaluator loop: a memory_size frame stack, periodic re-planning with
the fused 32-sample denoise + critic ranking
(navdp_policy.py:302 predict_pointgoal_batch_action_vel), and execution of
the best trajectory as velocity steps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.model import get_config, get_policy


@Agent.register("navdp")
class NavDPAgent(Agent):
    def __init__(self, cfg: AgentCfg, policy=None):
        super().__init__(cfg)
        s = cfg.model_settings or {}
        if policy is None:
            model_cfg = get_config("navdp")
            for k, v in s.items():
                if k not in ("image_size", "replan_every", "sample_num", "goal_mode"):
                    setattr(model_cfg, k, v)
            cls = get_policy("navdp")
            if cfg.ckpt_path:
                policy = cls.from_pretrained(cfg.ckpt_path, cfg=model_cfg)
            else:
                policy = cls.build(model_cfg, image_size=int(s.get("image_size", 224)))
        self.policy = policy
        self.image_size = int(s.get("image_size", 224))
        self.memory_size = getattr(self.policy.cfg, "memory_size", 8)
        self.replan_every = int(s.get("replan_every", 4))
        self.sample_num = int(s.get("sample_num", 16))
        self.goal_mode = s.get("goal_mode", "pointgoal")  # pointgoal | nogoal | imagegoal
        self._rng = jax.random.PRNGKey(int(s.get("seed", 0)))
        self.reset()

    def reset(self, reset_index: Optional[List[int]] = None) -> None:
        self.rgb_memory: List[np.ndarray] = []
        self.depth_memory: List[np.ndarray] = []
        self.plan: List[np.ndarray] = []

    def _push_memory(self, obs: Dict[str, Any]) -> None:
        import cv2

        rgb = np.asarray(obs["rgb"], np.float32)
        if rgb.shape[:2] != (self.image_size, self.image_size):
            rgb = cv2.resize(rgb, (self.image_size, self.image_size))
        depth = np.asarray(obs.get("depth", np.zeros(rgb.shape[:2])), np.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        if depth.shape != (self.image_size, self.image_size):
            depth = cv2.resize(depth, (self.image_size, self.image_size),
                               interpolation=cv2.INTER_NEAREST)
        self.rgb_memory.append(rgb / 255.0)
        self.depth_memory.append(depth[..., None])
        self.rgb_memory = self.rgb_memory[-self.memory_size:]
        self.depth_memory = self.depth_memory[-self.memory_size:]

    def _memory_stack(self):
        pads = self.memory_size - len(self.rgb_memory)
        rgb = [self.rgb_memory[0]] * pads + self.rgb_memory
        depth = [self.depth_memory[0]] * pads + self.depth_memory
        return np.stack(rgb)[None], np.stack(depth)[None]

    def step(self, obs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        assert len(obs) == 1, "VN agent is single-env"
        o = obs[0]
        self._push_memory(o)
        if not self.plan:
            rgb, depth = self._memory_stack()
            self._rng, sub = jax.random.split(self._rng)
            batch = {
                "mode": self.goal_mode,
                "observations": {
                    "input_images": rgb, "input_depths": depth,
                    "goal_point": np.asarray(
                        o.get("pointgoal", [1.0, 0.0, 0.0]), np.float32)[None],
                    "goal_image": np.zeros((1, self.image_size, self.image_size, 6),
                                           np.float32),
                    "goal_pixel": np.zeros((1, self.image_size, self.image_size, 7),
                                           np.float32),
                },
                "rng": sub,
                "sample_num": self.sample_num,
            }
            _, positive = self.policy.forward(batch)
            best = np.asarray(positive)[0, 0]  # (P, 3) integrated waypoints
            deltas = np.diff(np.concatenate([np.zeros((1, 3)), best], 0), axis=0)
            self.plan = list(deltas[: self.replan_every])
        wp = self.plan.pop(0)
        return [{"action": [1], "ideal_flag": True, "waypoint": wp.tolist(),
                 "velocity": [float(wp[0]) * 4.0, float(wp[2]) * 4.0]}]
