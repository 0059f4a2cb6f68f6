"""Evaluator base + registry, and the distributed gather template.

Reference surface: internnav/evaluator/base.py:6-39 (registry; base holds
self.env + self.agent) and distributed_base.py:70-149 (eval() template:
per-rank eval_action → gather → calc_metrics → rank-0 result.json append).

TPU-native distribution: episodes are sharded per host process
(rank::world_size); metric gathering is host-side via
multihost_utils.process_allgather when jax.process_count() > 1, else a
no-op — no padded NCCL all_gather dance.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.evaluator import EvalCfg
from internnav_tpu.env.base import Env
from internnav_tpu.utils.logging import get_logger
from internnav_tpu.utils.registry import Registry

evaluator_registry: Registry = Registry("evaluator")


def get_rank_world() -> tuple:
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class Evaluator:
    def __init__(self, cfg: EvalCfg, env: Optional[Env] = None, agent: Optional[Agent] = None):
        self.cfg = cfg
        self.rank, self.world_size = get_rank_world()
        self.logger = get_logger("evaluator", cfg.output_dir)
        self.env = env
        self.agent = agent
        if self.env is None and cfg.env is not None:
            self.env = Env.init(cfg.env, cfg.task)
        if self.agent is None:
            if cfg.use_agent_server:
                from internnav_tpu.comm.client import AgentClient

                self.agent = AgentClient(cfg.agent)
            else:
                self.agent = Agent.init(cfg.agent)

    register = staticmethod(evaluator_registry.register)

    #: modules whose import registers additional evaluators; lazy-loaded by
    #: init() so eval_type='habitat_vln'/'habitat_dialog' resolve from the
    #: CLI without import-time cycles (dialog.evaluator imports this module)
    _LAZY_EVALUATOR_MODULES = (
        "internnav_tpu.habitat.evaluator",
        "internnav_tpu.dialog.evaluator",
    )

    @classmethod
    def init(cls, cfg: EvalCfg, **kwargs) -> "Evaluator":
        if cfg.eval_type not in evaluator_registry:
            import importlib

            for mod in cls._LAZY_EVALUATOR_MODULES:
                importlib.import_module(mod)
        return evaluator_registry.build(cfg.eval_type, cfg, **kwargs)

    # ------------------------------------------------------------- template
    def eval_action(self) -> List[Dict[str, Any]]:
        """Per-rank evaluation: returns this rank's per-episode metric dicts."""
        raise NotImplementedError

    def calc_metrics(self, per_episode: List[Dict[str, Any]]) -> Dict[str, float]:
        from internnav_tpu.env.metrics import aggregate_metrics

        return aggregate_metrics(per_episode)

    def gather_results(self, local: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        if self.world_size == 1:
            return local
        from jax.experimental import multihost_utils

        # host-side gather of json payloads via fixed-size byte buffers
        payload = json.dumps(local, default=str).encode()
        n = np.asarray([len(payload)], np.int32)
        sizes = np.asarray(multihost_utils.process_allgather(n)).ravel()
        buf = np.zeros((int(sizes.max()),), np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        gathered = np.asarray(multihost_utils.process_allgather(buf))
        out: List[Dict[str, Any]] = []
        for r, size in enumerate(sizes):
            out.extend(json.loads(bytes(gathered[r][: int(size)]).decode()))
        return out

    def eval(self) -> Dict[str, float]:
        t0 = time.time()
        local = self.eval_action()
        merged = self.gather_results(local)
        metrics = self.calc_metrics(merged)
        metrics["wall_clock_s"] = time.time() - t0
        if self.rank == 0:
            os.makedirs(self.cfg.output_dir, exist_ok=True)
            with open(os.path.join(self.cfg.output_dir, "result.json"), "a") as f:
                f.write(json.dumps(metrics, default=str) + "\n")
            self.logger.info("eval metrics: %s", metrics)
        return metrics
