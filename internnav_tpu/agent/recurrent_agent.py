"""Batched recurrent agents (CMA / Seq2Seq).

Reference semantics (internnav/agent/cma_agent.py:14-138, seq2seq_agent.py):
keep per-env RNN states (N, layers, H), prev_actions (N,), not_done_masks
(N,); per-env reset zeroes that env's slices (reference index_fill_,
cma_agent.py:79-86); instructions padded to 200 tokens; policy runs
mode='inference' (argmax) and the output is wrapped as
[{'action': [a], 'ideal_flag': True}, ...].

TPU notes: the whole batch steps as ONE jitted forward regardless of how
many envs are mid-episode — masking handles resets, so shapes stay static
and the program compiles once.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.model import get_config, get_policy
from internnav_tpu.utils.misc import batch_obs


class _RecurrentAgentBase(Agent):
    policy_name = ""

    def __init__(self, cfg: AgentCfg, policy=None):
        super().__init__(cfg)
        model_cfg = get_config(self.policy_name)
        for k, v in (cfg.model_settings or {}).items():
            setattr(model_cfg, k, v)
        if policy is not None:
            # cohort agents share one policy (params + jit caches); only
            # the recurrent state here is per-agent
            self.policy = policy
        else:
            policy_cls = get_policy(self.policy_name)
            if cfg.ckpt_path:
                self.policy = policy_cls.from_pretrained(cfg.ckpt_path,
                                                         cfg=model_cfg)
            else:
                self.policy = policy_cls.build(model_cfg)
        self.model_cfg = model_cfg
        self.hidden_size = model_cfg.state_encoder.hidden_size
        self.num_layers = self.policy.num_recurrent_layers()
        self.instr_pad_len = 200
        self._states: Optional[np.ndarray] = None
        self._prev_actions: Optional[np.ndarray] = None
        self._not_done: Optional[np.ndarray] = None

    def _ensure_state(self, n: int) -> None:
        if self._states is None or self._states.shape[0] != n:
            self._states = np.zeros((n, self.num_layers, self.hidden_size), np.float32)
            self._prev_actions = np.zeros((n,), np.int32)
            self._not_done = np.zeros((n,), np.float32)  # 0 → first step of episode

    def reset(self, reset_index: Optional[List[int]] = None) -> None:
        if self._states is None:
            return
        if reset_index is None:
            self._states[:] = 0
            self._prev_actions[:] = 0
            self._not_done[:] = 0
        else:
            for i in reset_index:
                self._states[i] = 0
                self._prev_actions[i] = 0
                self._not_done[i] = 0

    # canonical input sizes: the CMA/Seq2Seq depth tower flattens its
    # spatial grid, so depth must arrive at the training resolution
    # (reference observation_space 256x256, cma_policy.py:130-135)
    rgb_size = (224, 224)
    depth_size = (256, 256)

    def _build_observations(self, obs: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        import cv2

        fields = []
        for o in obs:
            instr = np.asarray(o["instruction"], np.int32)
            padded = np.zeros((self.instr_pad_len,), np.int32)
            padded[: min(len(instr), self.instr_pad_len)] = instr[: self.instr_pad_len]
            depth = np.asarray(o["depth"], np.float32)
            if depth.ndim == 3:
                depth = depth[..., 0]
            if depth.shape != self.depth_size:
                depth = cv2.resize(depth, self.depth_size, interpolation=cv2.INTER_NEAREST)
            rgb = np.asarray(o["rgb"], np.float32)
            if rgb.shape[:2] != self.rgb_size:
                rgb = cv2.resize(rgb, self.rgb_size, interpolation=cv2.INTER_LINEAR)
            fields.append({
                "instruction": padded,
                "rgb": rgb,
                "depth": depth[..., None],
            })
        return batch_obs(fields)

    def step_coroutine(self, obs: List[Dict[str, Any]]):
        """Generator form of `step` for pipelined evaluation: the jitted
        forward dispatches asynchronously, then yields so a scheduler can
        run other cohorts' host work while this forward executes on
        device; the result fetch happens after resume."""
        n = len(obs)
        self._ensure_state(n)
        batch = {
            "observations": self._build_observations(obs),
            "rnn_states": jnp.asarray(self._states),
            "prev_actions": jnp.asarray(self._prev_actions),
            "masks": jnp.asarray(self._not_done),
            "mode": "inference",
        }
        actions, states, _ = self.policy.forward(batch)  # async dispatch
        yield  # device busy: recurrent forward in flight
        actions = np.asarray(actions).reshape(n)
        self._states = np.array(states)  # writable host copy (per-env reset)
        self._prev_actions = actions.astype(np.int32)
        self._not_done[:] = 1.0
        return [{"action": [int(a)], "ideal_flag": True} for a in actions]

    def step(self, obs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        gen = self.step_coroutine(obs)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value


@Agent.register("cma")
class CmaAgent(_RecurrentAgentBase):
    policy_name = "CMA_Policy"


@Agent.register("seq2seq")
class Seq2SeqAgent(_RecurrentAgentBase):
    policy_name = "Seq2Seq_Policy"
