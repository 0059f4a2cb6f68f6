"""Dual-cohort pipelined VLN evaluator.

`VLNBatchedEvaluator` leaves the accelerator idle whenever the host is
busy (simulator stepping, observation batching, result bookkeeping) and
vice versa. This evaluator splits the episode shard across N cohorts,
each with its own vectorized env and its own batched dual-system agent
slot state, ALL sharing one set of model params and jit caches. Cohorts
advance through `BatchedInternVLAN1Agent.step_coroutine`, which yields
at each async device submit — so while cohort A's fused S2/S1 program
runs on the accelerator, cohort B steps its simulators and builds its
next batch on the host. jax dispatch is asynchronous; everything runs on
ONE host thread (threads were measured 2x slower on networked-TPU
backends — see serving.PipelinedN1Server).

The reference has no counterpart: its evaluator binds one episode to
one GPU rank and blocks on every device call
(reference internnav/evaluator/vln_distributed_evaluator.py:268-317).

Config: ``eval_type: "vln_pipelined"`` with ``env_settings["cohorts"]``
(default 2); each cohort runs ``env_num`` parallel episodes, so the chip
serves ``cohorts * env_num`` streams.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.evaluator import EvalCfg
from internnav_tpu.env.episodes import Episode
from internnav_tpu.env.fake_env import FakeEnv
from internnav_tpu.evaluator.base import Evaluator
from internnav_tpu.evaluator.utils.data_collector import EpisodeResultStore
from internnav_tpu.evaluator.vln_evaluator import VLNBatchedEvaluator
from internnav_tpu.utils.logging import ProgressLogger


def _step_coroutine(agent, batch):
    """agent.step as a scheduler coroutine. Agents exposing
    `step_coroutine` (the batched dual-system agent) yield at device-wait
    points for cross-cohort overlap; any other agent runs blocking inside
    a zero-yield generator — correct, just without the overlap."""
    if hasattr(agent, "step_coroutine"):
        return agent.step_coroutine(batch)

    def blocking():
        if False:  # pragma: no cover — makes this a generator
            yield
        return agent.step(batch)

    return blocking()


class _Cohort:
    """Per-cohort eval state: env + agent slots + FSM bookkeeping."""

    def __init__(self, idx: int, env, agent, progress: ProgressLogger,
                 store: EpisodeResultStore) -> None:
        self.idx = idx
        self.env = env
        self.agent = agent
        self.progress = progress
        self.store = store
        self.obs_list: List[Optional[Dict[str, Any]]] = []
        self.results: List[Dict[str, Any]] = []
        self._prev_count = 0

    def start(self) -> None:
        self.obs_list = self.env.reset()
        for o in self.obs_list:
            if o is not None:
                self.progress.start(o["path_key"])

    def build_batch(self, fake_obs) -> Optional[List[Dict[str, Any]]]:
        """None when this cohort has no live episodes left."""
        if not self.env.is_running:
            return None
        batch, live = [], []
        for i, o in enumerate(self.obs_list):
            if o is None or o.get("done", False):
                batch.append(fake_obs())
            else:
                batch.append(o)
                live.append(i)
        return batch if live else None

    def apply(self, agent_out: List[Dict[str, Any]]) -> None:
        """env.step + terminate_ops for one macro-step."""
        actions = [int(a["action"][0]) for a in agent_out]
        self.obs_list = self.env.step(actions)
        for o in self.obs_list:
            if o is not None and not o.get("done", False):
                self.progress.step(o["path_key"])
        new = self.env.episode_results[self._prev_count:]
        if new:
            done_ids = [i for i, o in enumerate(self.obs_list)
                        if o is not None and o.get("done", False)]
            for rec in new:
                key = str(rec.get("path_key") or rec.get("episode_id", ""))
                self.store.save_eval_result(
                    key=key, fail_reason=rec.get("fail_reason", ""), info=rec)
                self.progress.end(key, "success" if rec.get("success") else
                                  (rec.get("fail_reason") or "fail"))
            self.results.extend(new)
            self._prev_count += len(new)
            if done_ids:
                self.agent.reset(done_ids)
                self.obs_list = self.env.reset(done_ids)
                for i in done_ids:
                    o = self.obs_list[i]
                    if o is not None:
                        self.progress.start(o["path_key"])


@Evaluator.register("vln_pipelined")
class VLNPipelinedEvaluator(VLNBatchedEvaluator):
    """See module docstring. Subclasses VLNBatchedEvaluator for episode
    loading / metrics / resume; replaces the step loop with the
    round-robin coroutine scheduler over N cohorts."""

    def __init__(self, cfg: EvalCfg, episodes: Optional[List[Episode]] = None,
                 **kwargs):
        self.cohort_count = int((cfg.env.env_settings or {}).get("cohorts", 2))
        super().__init__(cfg, episodes=episodes, **kwargs)

    # the base class builds env + agent for cohort 0; add the rest lazily
    def _build_cohorts(self) -> List[_Cohort]:
        cfg = self.cfg
        pending = list(getattr(self.env, "episodes", []))
        n = self.cohort_count
        cohorts: List[_Cohort] = []
        shares = [pending[c::n] for c in range(n)]
        # cohort 0 reuses the already-built env/agent; re-scope its episodes
        self.env.episodes = shares[0]
        cohorts.append(_Cohort(0, self.env, self.agent, self.progress,
                               self.store))
        if n > 1 and cfg.env.env_type != "fake":
            raise NotImplementedError(
                "vln_pipelined builds one env per cohort; only the fake "
                "vectorized env is constructible here (pass cohorts=1 or "
                "construct the evaluator with pre-built envs for real sims)")
        for c in range(1, n):
            env = FakeEnv(cfg.env, cfg.task, episodes=shares[c])
            agent = self._make_cohort_agent(c)
            cohorts.append(_Cohort(c, env, agent, self.progress, self.store))
        self._attach_decode_pool(cohorts)
        self._attach_s1_pool(cohorts)
        return cohorts

    def _attach_decode_pool(self, cohorts: List["_Cohort"]) -> None:
        """env_settings["shared_decode"]: batch every cohort's greedy S2
        decode into one grouped device program (one decoder weight stream
        per token serves all cohorts). Requires dual-system agents sharing
        one BatchedN1Policy inner; silently skipped otherwise."""
        settings = getattr(self.cfg.env, "env_settings", None) or {}
        if not settings.get("shared_decode"):
            return
        agents = [c.agent for c in cohorts]
        if not all(hasattr(a, "decode_pool")
                   and hasattr(getattr(a, "policy", None), "inner")
                   for a in agents):
            return
        from internnav_tpu.model.basemodel.internvla_n1.serving import (
            SharedDecodePool,
        )

        inner = agents[0].policy.inner
        pool = SharedDecodePool(inner, inner.cfg.n_query)
        for a in agents:
            a.decode_pool = pool

    def _attach_s1_pool(self, cohorts: List["_Cohort"]) -> None:
        """env_settings["shared_s1"]: batch every cohort's System-1 denoise
        into one grouped DiT program per scheduler pass
        (serving.s1_grouped_dispatch — row-identical up to float epsilon).
        Requires dual-system agents sharing one BatchedN1Policy inner;
        silently skipped otherwise."""
        settings = getattr(self.cfg.env, "env_settings", None) or {}
        if not settings.get("shared_s1"):
            return
        agents = [c.agent for c in cohorts]
        if not all(hasattr(a, "s1_pool")
                   and hasattr(getattr(a, "policy", None), "inner")
                   for a in agents):
            return
        from internnav_tpu.model.basemodel.internvla_n1.serving import (
            SharedS1Pool,
        )

        pool = SharedS1Pool()
        for a in agents:
            a.s1_pool = pool

    def _make_cohort_agent(self, idx: int):
        """A new agent with its own slot state sharing the cohort-0
        policy's params + jit caches (BatchedN1Policy inner sharing)."""
        base = self.agent
        if hasattr(base, "policy") and hasattr(base.policy, "inner"):
            from internnav_tpu.model.basemodel.internvla_n1.serving import (
                BatchedN1Policy,
            )

            inner = base.policy.inner
            pol = BatchedN1Policy(inner.model, inner.params, inner.cfg,
                                  batch_size=base.policy.batch_size,
                                  inner=inner)
            return type(base)(base.cfg, policy=pol)
        if hasattr(base, "policy"):
            try:
                # recurrent agents: share the policy object (params + jit
                # caches); per-agent state stays independent
                return type(base)(base.cfg, policy=base.policy)
            except TypeError:
                pass
        return Agent.init(self.cfg.agent)  # independent fallback

    def eval_action(self) -> List[Dict[str, Any]]:
        cohorts = self._build_cohorts()
        for c in cohorts:
            c.start()
        gens: Dict[int, Any] = {}
        out: Dict[int, Any] = {}
        while True:
            # phase 0: spawn a coroutine per live cohort (submits its first
            # device program, then yields)
            gens.clear()
            out.clear()
            for c in cohorts:
                batch = c.build_batch(self._fake_obs)
                if batch is not None:
                    gens[c.idx] = _step_coroutine(c.agent, batch)
            if not gens:
                break
            # round-robin: advance each coroutine one hop per pass, so one
            # cohort's host work runs while the others' programs execute
            live = dict(gens)
            while live:
                for ci in list(live):
                    try:
                        next(live[ci])
                    except StopIteration as stop:
                        out[ci] = stop.value
                        del live[ci]
            # host phase: env stepping + bookkeeping per cohort
            for c in cohorts:
                if c.idx in out:
                    c.apply(out[c.idx])
        results: List[Dict[str, Any]] = []
        for c in cohorts:
            results.extend(c.results)
        for rec in self.store.records():
            info = rec.get("info") or {}
            if info and info.get("episode_id") not in {
                    r.get("episode_id") for r in results}:
                results.append(info)
        self.progress.report()
        return results
