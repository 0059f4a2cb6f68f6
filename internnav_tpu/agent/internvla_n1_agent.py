"""InternVLA-N1 dual-system agent — async System-2 planner + System-1 actor.

Parity target: reference internnav/agent/internvla_n1_agent.py:21-407:
- background S2 thread (:133-208) consuming the newest pending request;
- scheduling policy `should_infer_s2` with modes 'sync' (S2 every macro
  step) and 'partial_async' (S2 at most once per sys2_max_forward_step=8
  S1 micro-steps) (:210-241);
- main thread consumes S2 output: a discrete-action queue, the look-down
  protocol (action 5 forces a look-down capture + immediate S2 re-infer,
  :287-295), or a latent → s1_step_latent with the pixel-goal memory frame
  + current frame (:303-336); depth x10 clamped at 5 m (:327);
- step budget bookkeeping (:341-371): ≤ sys2_max_forward_step actions per
  S2 latent, ≤ max_local_steps per S1 call.

Concurrency: the reference's three-lock mailbox is replaced by a proper
single-producer/single-consumer pair of size-1 queues with explicit
request ids (SURVEY.md §5.2 flags the manual locks as a known smell).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, List, Optional

import numpy as np

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.model.utils.vln_utils import S2Input, S2Output

LOOK_DOWN_ACTION = 5


def _build_n1_policy(cfg: AgentCfg, settings: Dict[str, Any]):
    """Shared N1 policy construction for the dual-system agents.

    ckpt_path set → load a checkpoint at the flagship 7B dims: a native
    `save_pretrained` dir (params.msgpack, see
    scripts/tools/convert_checkpoint.py) via `from_pretrained`, or a
    reference-format torch checkpoint via `from_pretrained_torch`
    (settings['weight_dtype']='int8'/'int4' selects the quantized-resident
    serving formats); otherwise random-init at settings['config']
    (default tiny)."""
    import os

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
    )

    system1 = settings.get("system1", "nextdit_async")
    n1_cfg = settings.get("config")
    if cfg.ckpt_path and os.path.exists(cfg.ckpt_path):
        native = os.path.exists(os.path.join(cfg.ckpt_path, "params.msgpack"))
        if n1_cfg is None:
            wdt = settings.get("weight_dtype")
            if wdt is None and native:
                # honor the serving format recorded at conversion time
                # (scripts/tools/convert_checkpoint.py) instead of
                # defaulting to bf16 and failing on the quantized tree
                import json

                try:
                    with open(os.path.join(cfg.ckpt_path, "config.json")) as f:
                        wdt = json.load(f).get("weight_dtype")
                except Exception:
                    wdt = None
            n1_cfg = InternVLAN1Config.qwen25vl_7b(
                system1, weight_dtype=wdt or "bf16",
                kv_dtype=settings.get("kv_dtype", "bf16"))
        if native:
            return InternVLAN1Policy.from_pretrained(cfg.ckpt_path, n1_cfg)
        return InternVLAN1Policy.from_pretrained_torch(cfg.ckpt_path, n1_cfg)
    if n1_cfg is None:
        n1_cfg = InternVLAN1Config.tiny(system1)
        kvd = settings.get("kv_dtype")
        if kvd and kvd != n1_cfg.text.kv_dtype:
            # honor the serving profile's KV dtype on the random-init
            # path too (the realworld launcher's --profile realtime
            # sets it; scripts/realworld/http_internvla_server.py)
            import dataclasses as _dc

            n1_cfg = _dc.replace(
                n1_cfg, text=_dc.replace(n1_cfg.text, kv_dtype=kvd))
    return InternVLAN1Policy.build(n1_cfg)


class S2Mailbox:
    """SPSC mailbox: latest-wins request slot + result slot."""

    def __init__(self):
        self._req: "queue.Queue[S2Input]" = queue.Queue(maxsize=1)
        self._res: "queue.Queue[S2Output]" = queue.Queue(maxsize=1)

    def submit(self, item: S2Input) -> None:
        try:  # latest request wins
            self._req.get_nowait()
        except queue.Empty:
            pass
        self._req.put(item)

    def take_request(self, timeout: float = 0.1) -> Optional[S2Input]:
        try:
            return self._req.get(timeout=timeout)
        except queue.Empty:
            return None

    def publish(self, out: S2Output) -> None:
        try:
            self._res.get_nowait()
        except queue.Empty:
            pass
        self._res.put(out)

    def poll(self) -> Optional[S2Output]:
        try:
            return self._res.get_nowait()
        except queue.Empty:
            return None

    def wait(self, timeout: Optional[float] = None) -> Optional[S2Output]:
        try:
            return self._res.get(timeout=timeout)
        except queue.Empty:
            return None


@Agent.register("internvla_n1")
class InternVLAN1Agent(Agent):
    def __init__(self, cfg: AgentCfg, policy=None):
        super().__init__(cfg)
        settings = cfg.model_settings or {}
        if policy is None:
            policy = _build_n1_policy(cfg, settings)
        self.policy = policy
        self.mode = settings.get("infer_mode", "partial_async")  # sync | partial_async
        self.sys2_max_forward_step = int(settings.get("sys2_max_forward_step", 8))
        self.max_local_steps = int(settings.get("max_local_steps", 4))
        self.depth_scale = float(settings.get("depth_scale", 10.0))
        self.depth_clip_m = float(settings.get("depth_clip_m", 5.0))
        self.continuous_traj = bool(settings.get("continuous_traj", True))
        self.async_s2 = bool(settings.get("async_s2", True))
        self.mailbox = S2Mailbox()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.reset()
        if self.async_s2:
            self._start_s2_thread()

    # ------------------------------------------------------------ lifecycle
    def reset(self, reset_index: Optional[List[int]] = None) -> None:
        self.policy.reset()
        self.action_queue: List[int] = []
        self.latent = None
        self.last_trajectory: Optional[np.ndarray] = None
        self.memory_frame: Optional[np.ndarray] = None
        self.steps_since_s2 = 0
        self.pending_s2 = False
        self.force_look_down = False
        self._req_idx = 0

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def _start_s2_thread(self) -> None:
        def run():
            while not self._stop.is_set():
                req = self.mailbox.take_request(timeout=0.1)
                if req is None:
                    continue
                out = self._infer_s2(req)
                out.idx = req.idx
                self.mailbox.publish(out)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    # -------------------------------------------------------------- helpers
    def _infer_s2(self, req: S2Input) -> S2Output:
        try:
            return self.policy.s2_step(req.rgb, req.instruction, look_down=req.look_down)
        except Exception:
            # reference retry semantics (:157-189): reset + one retry
            # without look-down, else synthesize STOP
            try:
                self.policy.reset()
                return self.policy.s2_step(req.rgb, req.instruction, look_down=False)
            except Exception:
                return S2Output(output_action=[0])

    def should_infer_s2(self) -> bool:
        """Reference :210-241."""
        if self.force_look_down:
            return True
        if self.mode == "sync":
            return len(self.action_queue) == 0
        # partial_async: re-plan when the budget is exhausted or nothing queued
        return (
            (self.steps_since_s2 >= self.sys2_max_forward_step)
            or (len(self.action_queue) == 0 and self.latent is None)
        )

    def _preprocess_depth(self, depth: np.ndarray) -> np.ndarray:
        d = np.asarray(depth, np.float32) * self.depth_scale
        return np.clip(d, 0.0, self.depth_clip_m)

    def _consume_s2(self, out: S2Output, obs: Dict[str, Any]) -> None:
        if out.output_action:
            acts = list(out.output_action)
            if LOOK_DOWN_ACTION in acts:
                self.force_look_down = True
                acts = [a for a in acts if a != LOOK_DOWN_ACTION]
            self.action_queue.extend(acts)
            self.latent = None
        if out.output_latent is not None:
            self.latent = out.output_latent
            self.memory_frame = np.asarray(obs["rgb"])
        self.steps_since_s2 = 0

    def _run_s1(self, obs: Dict[str, Any]) -> None:
        rgb = np.asarray(obs["rgb"])
        mem = self.memory_frame if self.memory_frame is not None else rgb
        rgb2 = np.stack([mem, rgb])[None]
        depth = obs.get("depth")
        depth2 = None
        if depth is not None:
            d = self._preprocess_depth(depth)
            if d.ndim == 2:
                d = d[..., None]
            depth2 = np.stack([d, d])[None]
        s1 = self.policy.s1_step_latent(
            rgb2, depth2, self.latent, continuous_traj=self.continuous_traj
        )
        self.last_trajectory = s1.trajectory
        self.action_queue.extend(s1.idx[: self.max_local_steps])

    # ------------------------------------------------------------------ api
    def step(self, obs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        assert len(obs) == 1, "dual-system agent is single-env (reference parity)"
        o = obs[0]
        instruction = o.get("instruction_text") or o.get("instruction", "")
        if not isinstance(instruction, str):
            instruction = " ".join(map(str, np.asarray(instruction).ravel().tolist()))

        if self.should_infer_s2():
            req = S2Input(rgb=np.asarray(o["rgb"]), depth=o.get("depth"),
                          instruction=instruction, look_down=self.force_look_down,
                          idx=self._req_idx)
            self.force_look_down = False
            if self.async_s2:
                self.mailbox.submit(req)
                self.pending_s2 = True
            else:
                self._consume_s2(self._infer_s2(req), o)

        if self.async_s2 and self.pending_s2:
            # block only when we have nothing else to execute
            timeout = None if (not self.action_queue and self.latent is None) else 0.0
            res = self.mailbox.wait(timeout) if timeout is None else self.mailbox.poll()
            if res is not None:
                self._consume_s2(res, o)
                self.pending_s2 = False

        if not self.action_queue and self.latent is not None:
            self._run_s1(o)

        action = self.action_queue.pop(0) if self.action_queue else 0
        self.steps_since_s2 += 1
        out: Dict[str, Any] = {"action": [int(action)], "ideal_flag": True}
        if self.last_trajectory is not None:
            out["trajectory"] = self.last_trajectory
        return [out]


class _DualState:
    """Per-slot dual-system bookkeeping (mirrors the single agent)."""

    __slots__ = ("action_queue", "latent", "memory_frame", "steps_since_s2",
                 "last_trajectory", "force_look_down")

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.action_queue: List[int] = []
        self.latent = None
        self.memory_frame: Optional[np.ndarray] = None
        self.steps_since_s2 = 10**9  # force S2 on the first step
        self.last_trajectory: Optional[np.ndarray] = None
        self.force_look_down = False


@Agent.register("internvla_n1_batched")
class BatchedInternVLAN1Agent(Agent):
    """Batched dual-system agent: B episode slots step through ONE fused
    S2 program and ONE batched S1 denoise per macro-step (serving.
    BatchedN1Policy). Per-slot scheduling semantics are identical to
    InternVLAN1Agent's partial_async mode with synchronous S2 — batching
    across episodes replaces the reference's background-thread async as
    the way to keep the accelerator busy.

    The reference cannot express this: its agent API is strictly
    single-stream (one episode per GPU rank,
    reference internnav/env/habitat_env.py:72)."""

    def __init__(self, cfg: AgentCfg, policy=None):
        super().__init__(cfg)
        settings = cfg.model_settings or {}
        self.batch_size = int(settings.get("batch_size", 8))
        if policy is None:
            from internnav_tpu.model.basemodel.internvla_n1.serving import (
                BatchedN1Policy,
            )

            single = _build_n1_policy(cfg, settings)
            policy = BatchedN1Policy(single.model, single.params, single.cfg,
                                     batch_size=self.batch_size,
                                     inner=single)
        self.policy = policy
        self.mode = settings.get("infer_mode", "partial_async")
        self.sys2_max_forward_step = int(settings.get("sys2_max_forward_step", 8))
        self.max_local_steps = int(settings.get("max_local_steps", 4))
        self.max_new_tokens = int(settings.get("max_new_tokens", 128))
        self.continuous_traj = bool(settings.get("continuous_traj", True))
        self.num_sample_trajs = int(settings.get("num_sample_trajs", 32))
        self.depth_scale = float(settings.get("depth_scale", 10.0))
        self.depth_clip_m = float(settings.get("depth_clip_m", 5.0))
        self.states = [_DualState() for _ in range(self.batch_size)]
        self._instructions = [""] * self.batch_size
        #: optional serving.SharedDecodePool — when set (by a multi-cohort
        #: scheduler), S2 submits PREFILL-only programs and the pool
        #: batches every cohort's greedy decode into one grouped program
        #: (one decoder weight stream per token for all cohorts)
        self.decode_pool = None
        #: optional serving.SharedS1Pool — when set, System-1 denoises are
        #: prepared per cohort and dispatched as ONE grouped DiT program
        #: for every pooled cohort (serving.s1_grouped_dispatch)
        self.s1_pool = None

    # ------------------------------------------------------------ lifecycle
    def reset(self, reset_index: Optional[List[int]] = None) -> None:
        ids = range(self.batch_size) if reset_index is None else reset_index
        for i in ids:
            self.states[i].reset()
            self.policy.reset_slot(i, self._instructions[i])

    def close(self) -> None:
        pass

    # -------------------------------------------------------------- helpers
    def _should_infer_s2(self, st: _DualState) -> bool:
        if self.mode == "sync":
            return len(st.action_queue) == 0
        return (st.steps_since_s2 >= self.sys2_max_forward_step
                or (len(st.action_queue) == 0 and st.latent is None))

    def _consume_s2(self, st: _DualState, out: S2Output,
                    rgb: np.ndarray) -> None:
        if out.output_action:
            acts = [a for a in out.output_action if a != LOOK_DOWN_ACTION]
            st.action_queue.extend(acts)
            st.latent = None
        if out.output_latent is not None:
            st.latent = out.output_latent
            st.memory_frame = np.asarray(rgb)
        st.steps_since_s2 = 0

    # ------------------------------------------------------------------ api
    def step_coroutine(self, obs: List[Dict[str, Any]]):
        """Generator form of `step`: yields after each async device submit
        (jax dispatch returns immediately), letting a scheduler interleave
        another cohort's host/device work — or simulator stepping — while
        this cohort's program runs on the accelerator. Drive with
        `next()` until StopIteration; the StopIteration value is the step
        result. `step()` below runs it to completion (blocking)."""
        assert len(obs) == self.batch_size, (
            f"expected {self.batch_size} slots, got {len(obs)}")
        for i, o in enumerate(obs):
            instr = o.get("instruction_text") or o.get("instruction", "")
            if not isinstance(instr, str):
                instr = " ".join(map(str, np.asarray(instr).ravel().tolist()))
            if instr and instr != self.policy.slots[i].instruction:
                self.policy.slots[i].instruction = instr
                self._instructions[i] = instr

        # ---- batched S2 for every slot whose schedule demands it
        s2_ids = [i for i, st in enumerate(self.states)
                  if self._should_infer_s2(st)]
        if s2_ids:
            imgs = np.stack([np.asarray(obs[i]["rgb"]) for i in s2_ids])
            if self.decode_pool is not None:
                handle = self.policy.s2_prefill_submit(
                    imgs, max_new_tokens=self.max_new_tokens,
                    slot_ids=s2_ids)
                self.decode_pool.add(handle)
                yield  # device busy: prefill in flight; pool gathers peers
                # first cohort to resume dispatches the grouped decode for
                # every pooled prefill (the scheduler has advanced all
                # cohorts past their submit by now)
                self.decode_pool.flush()
            else:
                handle = self.policy.s2_submit(
                    imgs, max_new_tokens=self.max_new_tokens,
                    slot_ids=s2_ids)
                yield  # device busy: S2 prefill+decode in flight
            outs = self.policy.s2_collect(handle)
            for i, out in zip(s2_ids, outs):
                self._consume_s2(self.states[i], out,
                                 np.asarray(obs[i]["rgb"]))

        # ---- batched S1 for every slot holding a latent and no queue;
        # only the CURRENT frames are shipped — each slot's memory frame
        # (and its DINOv2 features) is cached on device by the policy
        s1_ids = [i for i, st in enumerate(self.states)
                  if not st.action_queue and st.latent is not None]
        if s1_ids:
            import jax.numpy as jnp

            cur = np.stack([np.asarray(obs[i]["rgb"]) for i in s1_ids])
            lat = jnp.concatenate(
                [jnp.asarray(self.states[i].latent) for i in s1_ids], axis=0)
            system1 = getattr(getattr(self.policy, "cfg", None),
                              "system1", "") or ""
            if "navdp" in system1:
                # navdp head consumes explicit [memory, current] RGBD pairs
                # (serving._s1_navdp_prepare); assemble them from per-slot
                # state + current obs with the single-stream preprocessing
                # (depth x scale, clamp; memory depth approximated by the
                # current depth exactly like InternVLAN1Agent._consume_s2)
                rgb_pairs, depth_pairs = [], []
                for k, i in enumerate(s1_ids):
                    cur_i = cur[k]
                    mem = self.states[i].memory_frame
                    rgb_pairs.append(np.stack(
                        [cur_i if mem is None else mem, cur_i]))
                    d = obs[i].get("depth")
                    if d is None:
                        d = np.zeros(cur_i.shape[:2] + (1,), np.float32)
                    d = np.clip(np.asarray(d, np.float32) * self.depth_scale,
                                0.0, self.depth_clip_m)
                    if d.ndim == 2:
                        d = d[..., None]
                    depth_pairs.append(np.stack([d, d]))
                if self.s1_pool is not None:
                    # flagship shared-grouped topology: pool the navdp spec
                    # with peer cohorts' denoises (one grouped DDPM program,
                    # serving.s1_grouped_dispatch navdp bucket)
                    spec = self.policy.s1_prepare(
                        np.stack(rgb_pairs), lat,
                        num_sample_trajs=self.num_sample_trajs,
                        depth=np.stack(depth_pairs))
                    self.s1_pool.add(spec)
                    yield  # uploads done; pool gathers peer cohorts
                    self.s1_pool.flush()
                    h1 = spec["handle"]
                else:
                    h1 = self.policy.s1_submit(
                        np.stack(rgb_pairs), lat,
                        num_sample_trajs=self.num_sample_trajs,
                        depth=np.stack(depth_pairs))
                    yield  # device busy: navdp denoise in flight
            elif self.s1_pool is not None:
                spec = self.policy.s1_prepare(
                    cur, lat, num_sample_trajs=self.num_sample_trajs,
                    slot_ids=s1_ids)
                self.s1_pool.add(spec)
                yield  # uploads done; pool gathers peer cohorts' denoises
                # first cohort to resume dispatches the grouped DiT program
                # for every pooled spec
                self.s1_pool.flush()
                h1 = spec["handle"]
            else:
                h1 = self.policy.s1_submit(
                    cur, lat, num_sample_trajs=self.num_sample_trajs,
                    slot_ids=s1_ids)
                yield  # device busy: S1 denoise in flight
            s1_outs = self.policy.s1_collect(h1)
            for i, s1 in zip(s1_ids, s1_outs):
                st = self.states[i]
                st.last_trajectory = s1.trajectory
                st.action_queue.extend(s1.idx[: self.max_local_steps])

        # ---- pop one action per slot
        result: List[Dict[str, Any]] = []
        for st in self.states:
            action = st.action_queue.pop(0) if st.action_queue else 0
            st.steps_since_s2 += 1
            out: Dict[str, Any] = {"action": [int(action)], "ideal_flag": True}
            if st.last_trajectory is not None:
                out["trajectory"] = st.last_trajectory
            result.append(out)
        return result

    def step(self, obs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        gen = self.step_coroutine(obs)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value
