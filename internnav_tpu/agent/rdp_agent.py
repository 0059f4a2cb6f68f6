"""RDP agent — continuous diffusion-policy inference with action caching.

Reference semantics (internnav/agent/rdp_agent.py:267-353): per-env RNN
state + a per-env cache of predicted waypoints; every step runs
mode='update_rnn'; when an env's cache is empty, mode='act' denoises a new
trajectory of len_traj_pred waypoints and the first len_traj_act are
cached and popped one per step; stop decision from the stop-progress head;
prev-action history window of the last len_traj_act continuous actions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.model import get_config, get_policy
from internnav_tpu.utils.misc import batch_obs


@Agent.register("rdp")
class RdpAgent(Agent):
    def __init__(self, cfg: AgentCfg):
        super().__init__(cfg)
        model_cfg = get_config("rdp")
        for k, v in (cfg.model_settings or {}).items():
            setattr(model_cfg, k, v)
        policy_cls = get_policy("rdp")
        if cfg.ckpt_path:
            self.policy = policy_cls.from_pretrained(cfg.ckpt_path, cfg=model_cfg)
        else:
            self.policy = policy_cls.build(model_cfg)
        self.model_cfg = model_cfg
        self.len_traj_act = model_cfg.len_traj_act
        self.hidden = model_cfg.state_encoder.hidden_size
        self.stop_threshold = float((cfg.model_settings or {}).get("stop_threshold", 0.85))
        self._rng = jax.random.PRNGKey(int((cfg.model_settings or {}).get("seed", 0)))
        self._states: Optional[np.ndarray] = None
        self._prev_actions: Optional[np.ndarray] = None
        self._masks: Optional[np.ndarray] = None
        self._caches: Optional[List[List[np.ndarray]]] = None

    def _ensure(self, n: int) -> None:
        if self._states is None or self._states.shape[0] != n:
            self._states = np.zeros((n, 1, self.hidden), np.float32)
            self._prev_actions = np.zeros((n, self.len_traj_act, 3), np.float32)
            self._masks = np.zeros((n,), np.float32)
            self._caches = [[] for _ in range(n)]

    def reset(self, reset_index: Optional[List[int]] = None) -> None:
        if self._states is None:
            return
        ids = range(self._states.shape[0]) if reset_index is None else reset_index
        for i in ids:
            self._states[i] = 0
            self._prev_actions[i] = 0
            self._masks[i] = 0
            self._caches[i] = []

    def _build_obs(self, obs: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        import cv2

        rows = []
        for o in obs:
            instr = np.asarray(o["instruction"], np.int32)
            padded = np.ones((80,), np.int32)  # roberta pad id = 1
            padded[: min(len(instr), 80)] = instr[:80]
            rgb = np.asarray(o["rgb"], np.float32)
            if rgb.shape[:2] != (224, 224):
                rgb = cv2.resize(rgb, (224, 224))
            depth = np.asarray(o["depth"], np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
            if depth.shape != (256, 256):
                depth = cv2.resize(depth, (256, 256), interpolation=cv2.INTER_NEAREST)
            imu = np.asarray(o.get("imu", np.zeros(3)), np.float32)
            rows.append({"instruction": padded, "rgb": rgb,
                         "depth": depth[..., None], "imu": imu})
        return batch_obs(rows)

    def step_coroutine(self, obs: List[Dict[str, Any]]):
        """Generator form of `step` for pipelined evaluation: both device
        programs (RNN update + denoise, when the waypoint cache is empty)
        dispatch before the yield — `need_act` depends only on host-side
        caches — so the fetches after resume overlap other cohorts."""
        n = len(obs)
        self._ensure(n)
        observations = self._build_obs(obs)
        base = {
            "observations": observations,
            "rnn_states": jnp.asarray(self._states),
            "prev_actions": jnp.asarray(self._prev_actions),
            "masks": jnp.asarray(self._masks),
        }
        # update RNN every step (reference rdp_agent mode='update_rnn')
        _, states = self.policy.forward(dict(base, mode="update_rnn"))
        need_act = any(len(c) == 0 for c in self._caches)
        act_out = None
        if need_act:
            self._rng, sub = jax.random.split(self._rng)
            act_out = self.policy.forward(dict(base, mode="act", rng=sub))
        yield  # device busy: update_rnn (+ act) in flight
        self._states = np.array(states)
        self._masks[:] = 1.0

        stop_flags = np.zeros((n,), bool)
        if need_act:
            traj, _, _, stop_progress, _ = act_out
            waypoints = self.policy.unnormalize_actions(np.asarray(traj), cumsum=False)
            stop_np = np.asarray(stop_progress).reshape(n)
            for i in range(n):
                if len(self._caches[i]) == 0:
                    self._caches[i] = list(waypoints[i][: self.len_traj_act])
                    stop_flags[i] = stop_np[i] > self.stop_threshold

        out = []
        for i in range(n):
            wp = self._caches[i].pop(0)
            # shift prev-action history window (most recent first)
            self._prev_actions[i] = np.roll(self._prev_actions[i], 1, axis=0)
            self._prev_actions[i][0] = wp
            if stop_flags[i]:
                out.append({"action": [0], "ideal_flag": True, "waypoint": wp.tolist(),
                            "stop": True})
            else:
                out.append({"action": self._waypoint_to_discrete(wp),
                            "ideal_flag": True, "waypoint": wp.tolist(), "stop": False})
        return out

    def step(self, obs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        gen = self.step_coroutine(obs)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    @staticmethod
    def _waypoint_to_discrete(wp: np.ndarray) -> List[int]:
        """Continuous (dx, dy, dyaw) → discrete VLN action (reference
        parse_action 'discrete' eval mode, map_action_to_2d semantics)."""
        dx, dy, dyaw = float(wp[0]), float(wp[1]), float(wp[2])
        if abs(dyaw) > 0.13:  # ≥ half of 15°
            return [2] if dyaw > 0 else [3]
        if dx > 0.05:
            return [1]
        return [0]
