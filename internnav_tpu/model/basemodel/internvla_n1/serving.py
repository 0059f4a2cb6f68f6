"""Batched multi-episode dual-system serving.

The reference evaluates one episode per GPU rank (habitat eval:
/root/reference/scripts/eval/bash/eval_dual_system.sh:4-8,
/root/reference/internnav/env/habitat_env.py:72) — its agent API is
strictly single-stream. On TPU the S2 greedy decode is HBM-bandwidth
bound: every decoded token streams the full decoder weights (15.2 GB
bf16 / 7.6 GB int8) from HBM once, regardless of batch size. Stepping B
independent episodes through ONE fused S2 program therefore multiplies
actions/sec/chip nearly linearly in B until the MXU becomes the
bottleneck — the single biggest honest throughput lever available to a
TPU-native design.

`BatchedN1Policy` keeps B per-episode histories on the host and drives
the same fused program (`InternVLAN1Policy._fused_s2_fn`) with stacked
rows:

- rows are grouped by history length (``n_images``) so every fused call
  has a uniform per-row image-token layout (after ~8 steps all live
  slots saturate at 9 images and form a single group);
- prompts within a group are right-padded to a shared 64-token bucket
  with pad-isolating segment ids — bit-identical to the unpadded
  single-stream program (see ``qwen_text.greedy_generate``);
- per-slot per-frame vision tokens are cached, so each macro-step
  encodes exactly B new frames in one batched ViT call;
- System-1 denoising runs all rows' 32-sample flow-matching Euler loops
  in one jitted program.

Reference behavioral parity targets:
/root/reference/internnav/model/basemodel/internvla_n1/internvla_n1_policy.py
(s2_step prompt/history semantics) and internvla_n1.py:320-441
(generate_latents / generate_traj).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
from internnav_tpu.model.utils.vln_utils import (
    S1Output,
    S2Output,
    parse_actions,
    traj_to_actions,
)
from internnav_tpu.ops.rope import get_rope_index_25

import re


class _Slot:
    """Host-side state for one episode stream."""

    __slots__ = ("rgb_list", "episode_idx", "instruction", "vision_cache",
                 "active", "llm_output", "s1_mem_frame", "s1_mem_feats",
                 "prompt_cache")

    def __init__(self) -> None:
        self.reset("")

    def reset(self, instruction: str) -> None:
        self.rgb_list: List[np.ndarray] = []
        self.episode_idx = 0
        self.instruction = instruction
        self.vision_cache: Dict[int, Any] = {}
        self.active = True
        self.llm_output = ""
        # System-1 memory frame, cached on DEVICE: the uint8 frame that
        # produced the current latent (uploaded once, at S2 time), and its
        # DINOv2 features (computed by the first S1 call, reused by the
        # rest). The reference re-uploads and re-encodes both frames every
        # call (internvla_n1.py:365-379).
        self.s1_mem_frame: Any = None
        self.s1_mem_feats: Any = None
        #: (instruction, n_images, hw) -> (ids, rope pos, rope delta)
        self.prompt_cache: Dict[Any, Any] = {}

    #: device vision-token entries kept per slot. History sampling touches
    #: at most num_history+1 frames per step, but over a long episode every
    #: frame is "current" once — unbounded caching would hold
    #: O(episode_len) device tokens per slot (~0.5 MB each at 7B dims).
    #: LRU-evicted entries re-encode from the host rgb_list copy on a miss.
    CACHE_CAP = 24

    def cache_get(self, k):
        v = self.vision_cache.pop(k, None)
        if v is not None:
            self.vision_cache[k] = v  # LRU touch
        return v

    def cache_put(self, k, v) -> None:
        self.vision_cache[k] = v
        while len(self.vision_cache) > self.CACHE_CAP:
            self.vision_cache.pop(next(iter(self.vision_cache)))


class BatchedN1Policy:
    """B-slot batched InternVLA-N1 dual-system policy (see module doc)."""

    def __init__(self, model, params, cfg, batch_size: int,
                 tokenizer=None, inner: Optional[InternVLAN1Policy] = None
                 ) -> None:
        # `inner` lets multiple cohorts share one policy (params + jit
        # caches): a second cohort then costs zero compiles and zero extra
        # HBM (PipelinedN1Server)
        self.inner = inner if inner is not None else InternVLAN1Policy(
            model, params, cfg, tokenizer=tokenizer)
        self.cfg = cfg
        self.batch_size = batch_size
        self.slots = [_Slot() for _ in range(batch_size)]
        self._rng = jax.random.PRNGKey(0)
        #: content-addressed device copies of prompt metadata (see
        #: _device_meta) — steady-state prompts re-upload nothing
        self._meta_cache: Dict[bytes, tuple] = {}

    # ------------------------------------------------------------ lifecycle
    def reset_slot(self, i: int, instruction: str) -> None:
        self.slots[i].reset(instruction)

    def reset(self, instructions: List[str]) -> None:
        assert len(instructions) == self.batch_size
        for s, ins in zip(self.slots, instructions):
            s.reset(ins)

    # --------------------------------------------------------------- vision
    def _slot_frame_keys(self, slot: _Slot) -> List[int]:
        """History frame indices + current, matching the single-stream
        policy (np.linspace over episode_idx, num_history samples)."""
        if slot.episode_idx == 0:
            hist: List[int] = []
        else:
            hist = np.unique(np.linspace(
                0, slot.episode_idx - 1, self.inner.num_history,
                dtype=np.int32)).tolist()
        return sorted(int(k) for k in hist) + [len(slot.rgb_list) - 1]

    def _encode_new_frames(self, slots: List[int],
                           dev_current=None,
                           current_row: Optional[Dict[int, int]] = None) -> None:
        """One batched ViT call over every slot's not-yet-cached frames.

        `dev_current` is the already-uploaded (B, H, W, 3) uint8 device
        stack of this step's frames (row per `current_row[slot]`): in the
        steady state the only uncached frame per slot is the current one,
        so no extra host→device transfer happens here. Frames seeded
        host-side (resume / first steps) are batched into one upload."""
        todo: List[tuple] = []  # (slot_idx, frame_idx)
        host_imgs: List[np.ndarray] = []
        parts: List[Any] = []
        for i in slots:
            s = self.slots[i]
            for k in self._slot_frame_keys(s):
                if s.cache_get(k) is None:
                    cur_idx = len(s.rgb_list) - 1
                    if (dev_current is not None and current_row is not None
                            and k == cur_idx and i in current_row):
                        parts.append(("dev", current_row[i]))
                    else:
                        parts.append(("host", len(host_imgs)))
                        host_imgs.append(s.rgb_list[k])
                    todo.append((i, k))
        if not todo:
            return
        if host_imgs and parts and any(p[0] == "dev" for p in parts):
            host_dev = jnp.asarray(
                np.stack(host_imgs).astype(np.uint8))  # one upload
            stack = jnp.stack([
                dev_current[r] if kind == "dev" else host_dev[r]
                for kind, r in parts])
        elif host_imgs:
            stack = np.stack(host_imgs)
        else:
            stack = jnp.stack([dev_current[r] for _, r in parts])
        tokens, grid = self.inner._encode_images(stack)
        per = tokens.shape[0] // len(todo)
        for j, (i, k) in enumerate(todo):
            self.slots[i].cache_put(k, tokens[j * per:(j + 1) * per])

    # ---------------------------------------------------------------- steps
    @staticmethod
    def _pow2_bucket(n: int) -> int:
        """Smallest compute-batch bucket >= n from {2^k} U {3*2^k}.

        The 3*2^k buckets (24, 48, 96...) matter for serving: per-program
        decode time is nearly batch-independent (every token streams the
        full decoder weights), so fewer cohorts with larger batches win —
        and padding 24 -> 32 or 48 -> 64 would waste 33% of the
        prefill/S1 compute, which IS batch-linear. Jit-cache size stays
        O(log B)."""
        b = 1
        while True:
            if b >= n:
                return b
            if 3 * (b // 2) >= n and b >= 2:
                return 3 * (b // 2)
            b *= 2

    def _prep_group(self, rows: List[int], n_images: int, hw,
                    frame_keys: Dict[int, list]) -> Dict[str, Any]:
        """Host-side prompt/rope/token assembly for one history-length
        group: ids + M-RoPE indices (memoized per slot), compute-bucket
        padding, prompt-length bucket padding, image-token gather."""
        inner = self.inner
        cfg = self.cfg
        h = hw[0] // cfg.vision.patch_size
        w = hw[1] // cfg.vision.patch_size
        ids_rows, pos_rows, deltas, tok_rows = [], [], [], []
        for i in rows:
            s = self.slots[i]
            # prompt ids + M-RoPE indices depend only on
            # (instruction, n_images, hw) — identical every step at the
            # steady state, so memoize per slot (the numpy rope-index
            # walk over B ~700-token rows was a visible host cost per
            # macro-step)
            pkey = (s.instruction, n_images, hw)
            cached = s.prompt_cache.get(pkey)
            if cached is None:
                ids = inner._build_prompt_ids(s.instruction, n_images, hw)
                grid = np.tile(np.asarray([[1, h, w]]), (n_images, 1))
                pos, delta = get_rope_index_25(
                    ids, grid,
                    spatial_merge_size=cfg.vision.spatial_merge_size,
                    image_token_id=cfg.image_token_index,
                )
                cached = (ids[0], np.asarray(pos)[:, 0],
                          int(np.asarray(delta)[0, 0]))
                s.prompt_cache = {pkey: cached}  # one live entry
            ids_row, pos_row, delta_v = cached
            ids_rows.append(ids_row)
            pos_rows.append(pos_row)  # (3, P_i)
            deltas.append(delta_v)
            tok_rows.append([s.cache_get(k) for k in frame_keys[i]])

        # pad the group to a bucketed compute batch (row 0 repeated)
        Bg = self._pow2_bucket(len(rows))
        while len(ids_rows) < Bg:
            ids_rows.append(ids_rows[0])
            pos_rows.append(pos_rows[0])
            deltas.append(deltas[0])
            tok_rows.append(tok_rows[0])

        bucket = inner.PROMPT_BUCKET
        p_max = max(len(r) for r in ids_rows)
        T = -(-p_max // bucket) * bucket
        eos = inner.tokenizer.eos_token_id
        padded_ids = np.full((Bg, T), eos, np.int64)
        padded_pos = np.zeros((3, Bg, T), np.int64)
        prompt_seg = np.zeros((Bg, T), np.int32)
        prompt_len = np.zeros((Bg,), np.int32)
        for r, (ids, pos) in enumerate(zip(ids_rows, pos_rows)):
            P = len(ids)
            padded_ids[r, :P] = ids
            padded_pos[:, r, :P] = pos
            pad_pos = pos.max() + 1 + np.arange(T - P)
            padded_pos[:, r, P:] = pad_pos
            prompt_seg[r, P:] = 1
            prompt_len[r] = P
        img_tokens = jnp.concatenate(
            [t for row in tok_rows for t in row], axis=0)
        return dict(rows=rows, T=T, img_tokens=img_tokens,
                    padded_ids=padded_ids, padded_pos=padded_pos,
                    deltas=np.asarray(deltas, np.int32),
                    prompt_len=prompt_len, prompt_seg=prompt_seg)

    def s2_submit(self, images: np.ndarray, max_new_tokens: int = 128,
                  slot_ids: Optional[List[int]] = None) -> Dict[str, Any]:
        """Host-prep + async dispatch of one S2 macro-step; returns a
        handle for `s2_collect`. jax dispatch is asynchronous (<1 ms), so
        a scheduler can submit another cohort's work — or step simulators —
        while this cohort's fused program runs on device
        (PipelinedN1Server)."""
        inner = self.inner
        cfg = self.cfg
        if slot_ids is None:
            slot_ids = list(range(self.batch_size))
        B = len(slot_ids)
        assert images.shape[0] == B
        # ONE host→device upload of this step's frames; the rows are reused
        # for the ViT encode and as cached System-1 memory frames
        dev_imgs = jnp.asarray(np.asarray(images, np.uint8))
        current_row = {i: r for r, i in enumerate(slot_ids)}
        for r, i in enumerate(slot_ids):
            self.slots[i].rgb_list.append(np.asarray(images[r]))
        frame_keys = {i: self._slot_frame_keys(self.slots[i])
                      for i in slot_ids}
        self._encode_new_frames(slot_ids, dev_imgs, current_row)
        for i in slot_ids:
            self.slots[i].episode_idx += 1

        hw = images.shape[1:3]

        # group rows by history length so image-token layout is uniform
        groups: Dict[int, List[int]] = {}
        for i in slot_ids:
            groups.setdefault(len(frame_keys[i]), []).append(i)

        prepped = [self._prep_group(rows, n_images, hw, frame_keys)
                   for n_images, rows in sorted(groups.items())]

        pending = []
        for g in prepped:
            key = (f"fusedB_{g['padded_ids'].shape}_"
                   f"{g['img_tokens'].shape}_{max_new_tokens}")
            if key not in inner._jit_cache:
                inner._jit_cache[key] = inner._fused_s2_fn(
                    max_new_tokens, cfg.n_query)
            ids_d, pos_d, deltas_d, plen_d, seg_d = self._device_meta(g)
            tokens, _lengths, latents = inner._jit_cache[key](
                inner.params, g["img_tokens"], ids_d, pos_d, deltas_d,
                plen_d, seg_d,
            )
            # the device `lengths` output is consumed INSIDE the program
            # (latent positions); s2_collect re-derives it host-side from
            # the fetched tokens, so it is deliberately not threaded through
            pending.append((g["rows"], tokens, latents))
        return {"pending": pending, "dev_imgs": dev_imgs,
                "current_row": current_row, "slot_ids": slot_ids}

    def _device_meta(self, g: Dict[str, Any]):
        """Device copies of a group's prompt metadata (ids, M-RoPE
        positions, rope deltas, prompt lengths, pad segments), memoized by
        content digest. At the long-episode steady state these ~0.4 MB of
        arrays are IDENTICAL every macro-step (the prompts only change
        when an episode resets), and each host→device upload pays a fixed
        ~30 ms round trip on networked-TPU backends — five avoidable RPCs
        per cohort-cycle."""
        import hashlib

        hsh = hashlib.blake2b(digest_size=16)
        for name in ("padded_ids", "padded_pos", "deltas", "prompt_len",
                     "prompt_seg"):
            a = g[name]
            hsh.update(a.tobytes())
            hsh.update(str(a.shape).encode())
            hsh.update(a.dtype.str.encode())  # same bytes, same shape,
            # different dtype must MISS, not alias
        key = hsh.digest()
        cached = self._meta_cache.pop(key, None)
        if cached is None:
            cached = (jnp.asarray(g["padded_ids"]),
                      jnp.asarray(g["padded_pos"]),
                      jnp.asarray(g["deltas"]),
                      jnp.asarray(g["prompt_len"]),
                      jnp.asarray(g["prompt_seg"]))
            if len(self._meta_cache) >= 16:  # bounded LRU: evict the
                self._meta_cache.pop(next(iter(self._meta_cache)))  # coldest
        self._meta_cache[key] = cached  # (re)insert = LRU touch, so a slot
        # mid-warmup churning new prompts can't evict the hot steady-state
        # entries that the cache exists for
        return cached

    def s2_prefill_submit(self, images: np.ndarray,
                          max_new_tokens: int = 128,
                          slot_ids: Optional[List[int]] = None
                          ) -> Dict[str, Any]:
        """Prefill-only half of `s2_submit`: same host prep + uploads, but
        dispatches `_prefill_s2_fn` per group and leaves the greedy decode
        for a SHARED grouped-tail program (`PipelinedN1Server` with
        shared_decode=True batches every cohort's decode into one weight
        stream). The returned handle is completed by
        `PipelinedN1Server._shared_decode`, after which `s2_collect`
        consumes it unchanged."""
        inner = self.inner
        cfg = self.cfg
        if slot_ids is None:
            slot_ids = list(range(self.batch_size))
        B = len(slot_ids)
        assert images.shape[0] == B
        dev_imgs = jnp.asarray(np.asarray(images, np.uint8))
        current_row = {i: r for r, i in enumerate(slot_ids)}
        for r, i in enumerate(slot_ids):
            self.slots[i].rgb_list.append(np.asarray(images[r]))
        frame_keys = {i: self._slot_frame_keys(self.slots[i])
                      for i in slot_ids}
        self._encode_new_frames(slot_ids, dev_imgs, current_row)
        for i in slot_ids:
            self.slots[i].episode_idx += 1
        hw = images.shape[1:3]

        groups: Dict[int, List[int]] = {}
        for i in slot_ids:
            groups.setdefault(len(frame_keys[i]), []).append(i)

        pgroups = []
        for n_images, rows in sorted(groups.items()):
            g = self._prep_group(rows, n_images, hw, frame_keys)
            key = (f"prefillB_{g['padded_ids'].shape}_"
                   f"{g['img_tokens'].shape}_{max_new_tokens}")
            if key not in inner._jit_cache:
                inner._jit_cache[key] = inner._prefill_s2_fn(
                    max_new_tokens, cfg.n_query)
            ids_d, pos_d, deltas_d, plen_d, seg_d = self._device_meta(g)
            first, caches = inner._jit_cache[key](
                inner.params, g["img_tokens"], ids_d, pos_d, plen_d, seg_d,
            )
            g.update(first=first, caches=caches, deltas_d=deltas_d,
                     plen_d=plen_d)
            pgroups.append(g)
        return {"pgroups": pgroups, "dev_imgs": dev_imgs,
                "current_row": current_row, "slot_ids": slot_ids,
                "max_new_tokens": max_new_tokens}

    def s2_collect(self, handle: Dict[str, Any]) -> List[S2Output]:
        """Fetch + parse the results of an `s2_submit` (blocks on device)."""
        inner = self.inner
        dev_imgs = handle["dev_imgs"]
        current_row = handle["current_row"]
        by_slot: Dict[int, S2Output] = {}
        for rows, tokens, latents in handle["pending"]:
            tokens_h = np.asarray(jax.device_get(tokens))
            # lengths = first-stop-token index, exactly what
            # greedy_generate computes on device — derive it from the
            # fetched tokens instead of a second fetch (each fetch pays a
            # fixed ~30 ms round trip on networked-TPU backends; `lengths`
            # itself is never transferred). inner.stop_token_ids is the
            # SAME definition the device decode programs were built with.
            hit = np.isin(tokens_h, inner.stop_token_ids)
            lengths_h = np.where(hit.any(axis=1), hit.argmax(axis=1),
                                 tokens_h.shape[1])
            for r, i in enumerate(rows):
                gen = tokens_h[r][: int(lengths_h[r])]
                text = inner.tokenizer.decode(gen)
                self.slots[i].llm_output = text
                out = S2Output(idx=i)
                if re.search(r"\d", text):
                    coords = [int(c) for c in re.findall(r"\d+", text)]
                    if len(coords) >= 2:
                        out.output_pixel = np.array([coords[1], coords[0]])
                    out.output_latent = latents[r:r + 1]
                    # this step's frame becomes the System-1 memory frame
                    # for the new latent (agent._consume_s2 semantics); it
                    # is already on device — no re-upload at S1 time
                    self.slots[i].s1_mem_frame = dev_imgs[current_row[i]]
                    self.slots[i].s1_mem_feats = None
                else:
                    out.output_action = parse_actions(text)
                by_slot[i] = out
        return [by_slot[i] for i in handle["slot_ids"]]

    def s2_step(self, images: np.ndarray, max_new_tokens: int = 128,
                slot_ids: Optional[List[int]] = None) -> List[S2Output]:
        """One blocking S2 macro-step. images: (N, H, W, 3) uint8, one new
        frame per stepped slot; `slot_ids` selects which slots step
        (default: all). Returns S2Outputs aligned with `slot_ids`. Compute
        rows within each history-length group are padded to a power-of-two
        bucket so the jit cache stays O(log B) entries per group instead of
        one per subset size (padded rows duplicate the group's first row;
        their outputs are discarded)."""
        return self.s2_collect(self.s2_submit(images, max_new_tokens,
                                              slot_ids))

    _S1_MEAN = (0.485, 0.456, 0.406)
    _S1_STD = (0.229, 0.224, 0.225)

    def _s1_norm(self, raw):
        mean = jnp.asarray(self._S1_MEAN, jnp.float32)
        std = jnp.asarray(self._S1_STD, jnp.float32)
        return (raw.astype(jnp.float32) / 255.0 - mean) / std

    def _s1_legacy_fn(self, num_sample_trajs: int):
        """(params, latents, rgb_pairs_u8 (B,2,H,W,3)) → trajs."""
        inner = self.inner

        def fn(p, lat, raw, r):
            im = self._s1_norm(raw)
            return inner.model.apply(
                {"params": p},
                method=lambda mdl: mdl.generate_traj_nextdit(
                    lat, im, rng=r, num_sample_trajs=num_sample_trajs),
            )

        return jax.jit(fn)

    def _s1_full_fn(self, num_sample_trajs: int):
        """(params, latents, mem_u8 (B,H,W,3), cur_u8 (B,H,W,3)) →
        (trajs, mem_feats): encodes both frames, returns the memory frame's
        DINOv2 features for caching."""
        inner = self.inner

        def fn(p, lat, mem_u8, cur_u8, r):
            def run(mdl):
                mem_feats = mdl.rgb_feats(self._s1_norm(mem_u8))
                dp = mdl.generate_traj_nextdit_cached(
                    lat, mem_feats, self._s1_norm(cur_u8), rng=r,
                    num_sample_trajs=num_sample_trajs)
                return dp, mem_feats

            return inner.model.apply({"params": p}, method=run)

        return jax.jit(fn)

    def _s1_cached_fn(self, num_sample_trajs: int):
        """(params, latents, mem_feats, cur_u8) → trajs: the memory frame's
        features are already on device; only the current frame is encoded."""
        inner = self.inner

        def fn(p, lat, mem_feats, cur_u8, r):
            return inner.model.apply(
                {"params": p},
                method=lambda mdl: mdl.generate_traj_nextdit_cached(
                    lat, mem_feats, self._s1_norm(cur_u8), rng=r,
                    num_sample_trajs=num_sample_trajs),
            )

        return jax.jit(fn)

    def _s1_grouped_fn(self, num_sample_trajs: int, sizes: Tuple[int, ...],
                       mode: str):
        """One denoise program over several cohorts' stacked rows (see
        s1_grouped_dispatch). x_init is drawn per cohort block from that
        cohort's own key — bit-equal to the per-cohort programs' draws."""
        inner = self.inner
        norm = self._s1_norm

        def x_init_of(mdl, rngs):
            P = mdl.cfg.predict_step_nums
            return jnp.concatenate([
                jax.random.normal(rngs[g], (sz * num_sample_trajs, P, 3))
                for g, sz in enumerate(sizes)])

        if mode == "noimg":
            def fn(p, lat, rngs):
                def run(mdl):
                    return mdl.generate_traj_nextdit(
                        lat, None, num_sample_trajs=num_sample_trajs,
                        x_init=x_init_of(mdl, rngs))

                return inner.model.apply({"params": p}, method=run)

            return jax.jit(fn)

        def fn(p, lat, mem, cur, rngs):
            def run(mdl):
                mem_feats = mdl.rgb_feats(norm(mem)) if mode == "full" else mem
                dp = mdl.generate_traj_nextdit_cached(
                    lat, mem_feats, norm(cur),
                    num_sample_trajs=num_sample_trajs,
                    x_init=x_init_of(mdl, rngs))
                return (dp, mem_feats) if mode == "full" else dp

            return inner.model.apply({"params": p}, method=run)

        return jax.jit(fn)

    def _pad_rows(self, arr, Bp: int):
        if arr.shape[0] == Bp:
            return arr
        reps = jnp.repeat(arr[:1], Bp - arr.shape[0], axis=0)
        return jnp.concatenate([jnp.asarray(arr), reps], axis=0)

    def s1_submit(self, rgb: np.ndarray, latents,
                  num_sample_trajs: int = 32,
                  slot_ids: Optional[List[int]] = None,
                  depth: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """Async dispatch of one batched System-1 denoise; returns a handle
        for `s1_collect`.

        nextdit System-1 — two input forms:
        - rgb (B, H, W, 3): CURRENT frames only (production path). The
          memory frame for each row comes from the per-slot device cache
          populated by `s2_step` (zero re-upload), and its DINOv2 features
          are computed once per latent and reused by subsequent calls —
          each call uploads and encodes exactly one new frame per stream.
        - rgb (B, 2, H, W, 3): explicit [memory, current] pixel pairs
          (legacy/parity path, matches the single-stream policy API).

        navdp System-1 (reference internvla_n1_arch.py:10 `navdp_async`,
        navdp.py:197-289): explicit [memory, current] RGBD pairs —
        rgb (B, 2, H, W, 3) uint8 + depth (B, 2, H, W, 1); the sync
        variant is latents-only (rgb/depth ignored).
        """
        inner = self.inner
        cfg = self.cfg
        if "navdp" in cfg.system1:
            spec = self._s1_navdp_prepare(rgb, depth, latents,
                                          num_sample_trajs)
            self._s1_dispatch(spec)
            return spec["handle"]
        if "nextdit" not in cfg.system1:
            raise NotImplementedError(
                f"batched serving supports the nextdit and navdp System-1 "
                f"heads; got system1={cfg.system1!r}")
        B = rgb.shape[0]

        if rgb.ndim == 5:  # legacy [memory, current] pairs
            self._rng, sub = jax.random.split(self._rng)
            Bp = self._pow2_bucket(B)
            latents_p = self._pad_rows(jnp.asarray(latents), Bp)
            handle = {"B": B, "Bp": Bp, "nst": num_sample_trajs}
            rgb_u8 = np.asarray(rgb, np.uint8)
            if Bp != B:
                rgb_u8 = np.concatenate(
                    [rgb_u8, np.repeat(rgb_u8[:1], Bp - B, axis=0)], axis=0)
            key = f"s1B_{rgb_u8.shape}_{num_sample_trajs}"
            if key not in inner._jit_cache:
                inner._jit_cache[key] = self._s1_legacy_fn(num_sample_trajs)
            handle["dp"] = inner._jit_cache[key](
                inner.params, latents_p, jnp.asarray(rgb_u8), sub)
            return handle

        spec = self.s1_prepare(rgb, latents, num_sample_trajs, slot_ids)
        self._s1_dispatch(spec)
        return spec["handle"]

    def s1_prepare(self, rgb: np.ndarray, latents,
                   num_sample_trajs: int = 32,
                   slot_ids: Optional[List[int]] = None,
                   depth: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """Host prep + uploads for one cohort's System-1 WITHOUT dispatching
        the denoise. The returned spec either goes to `_s1_dispatch`
        (per-cohort program; what `s1_submit` does) or is grouped with other
        cohorts' specs into ONE device program via `s1_grouped_dispatch` —
        row-identical to per-cohort dispatch because each cohort block keeps
        its own rng draw (x_init AND per-step ancestral noises) and
        conditioning rows are batch-major. navdp cohorts route to the navdp
        spec builder so S2+NavDP rows are servable under shared_s1 too."""
        inner = self.inner
        cfg = self.cfg
        if "navdp" in cfg.system1:
            return self._s1_navdp_prepare(rgb, depth, latents,
                                          num_sample_trajs)
        self._rng, sub = jax.random.split(self._rng)
        B = rgb.shape[0]
        if slot_ids is None:
            slot_ids = list(range(B))
        assert rgb.ndim == 4, f"rgb must be (B,H,W,3), got {rgb.shape}"
        Bp = self._pow2_bucket(B)  # pow-2 compute batch: O(log B) jit cache
        latents_p = self._pad_rows(jnp.asarray(latents), Bp)
        spec: Dict[str, Any] = {
            "handle": {"B": B, "Bp": Bp, "nst": num_sample_trajs},
            "rng": sub, "latents": latents_p, "Bp": Bp,
            "nst": num_sample_trajs, "policy": self,
        }
        if "async" not in cfg.system1:
            # non-async nextdit ignores frames: latents-only denoise
            spec["mode"] = "noimg"
            return spec
        cur_u8 = jnp.asarray(np.asarray(rgb, np.uint8))  # one upload
        slots = [self.slots[i] for i in slot_ids]
        assert all(s.s1_mem_frame is not None for s in slots), (
            "current-frames-only S1 requires a cached memory frame; "
            "run s2_step first (it caches the frame that produced the latent)")
        fresh = [s.s1_mem_feats is None for s in slots]
        spec["cur"] = self._pad_rows(cur_u8, Bp)
        spec["hw"] = tuple(rgb.shape[1:])
        if any(fresh):
            # first call for at least one latent: encode memory frames too,
            # cache their features (no pixel upload — frames are device-side)
            spec["mode"] = "full"
            spec["mem"] = self._pad_rows(
                jnp.stack([s.s1_mem_frame for s in slots]), Bp)
            spec["slots"] = slots
        else:
            spec["mode"] = "cached"
            spec["mem"] = self._pad_rows(
                jnp.stack([s.s1_mem_feats for s in slots]), Bp)
        return spec

    def _s1_dispatch(self, spec: Dict[str, Any]) -> None:
        """Dispatch ONE cohort's prepared System-1 denoise (fills
        spec['handle']['dp'], caching fresh memory features on the slots)."""
        inner = self.inner
        nst = spec["nst"]
        Bp = spec["Bp"]
        handle = spec["handle"]
        if spec["mode"] == "navdp":
            key = f"s1Bnavdp_{(Bp,) + spec['hw']}_{nst}"
            if key not in inner._jit_cache:
                inner._jit_cache[key] = jax.jit(
                    lambda p, lat, im, de, r: inner.model.apply(
                        {"params": p},
                        method=lambda mdl: mdl.generate_traj_navdp_batched(
                            lat, im.astype(jnp.float32) / 255.0, de,
                            rng=r, sample_num=nst)))
            handle["dp"] = inner._jit_cache[key](
                inner.params, spec["latents"], spec["rgb"], spec["depth"],
                spec["rng"])
            return
        if spec["mode"] == "navdp_noimg":
            key = f"s1Bnavdp_noimg_{Bp}_{nst}"
            if key not in inner._jit_cache:
                inner._jit_cache[key] = jax.jit(
                    lambda p, lat, r: inner.model.apply(
                        {"params": p},
                        method=lambda mdl: mdl.generate_traj_navdp_batched(
                            lat, rng=r, sample_num=nst)))
            handle["dp"] = inner._jit_cache[key](
                inner.params, spec["latents"], spec["rng"])
            return
        if spec["mode"] == "noimg":
            key = f"s1Bnoimg_{Bp}_{nst}"
            if key not in inner._jit_cache:
                inner._jit_cache[key] = jax.jit(
                    lambda p, lat, r: inner.model.apply(
                        {"params": p},
                        method=lambda mdl: mdl.generate_traj_nextdit(
                            lat, None, rng=r, num_sample_trajs=nst)))
            handle["dp"] = inner._jit_cache[key](
                inner.params, spec["latents"], spec["rng"])
            return
        if spec["mode"] == "full":
            key = f"s1Bfull_{(Bp,) + spec['hw']}_{nst}"
            if key not in inner._jit_cache:
                inner._jit_cache[key] = self._s1_full_fn(nst)
            dp_dev, mem_feats = inner._jit_cache[key](
                inner.params, spec["latents"], spec["mem"], spec["cur"],
                spec["rng"])
            for r, s in enumerate(spec["slots"]):
                s.s1_mem_feats = mem_feats[r]  # async device slices
            handle["dp"] = dp_dev
            return
        key = f"s1Bcached_{(Bp,) + spec['hw']}_{nst}"
        if key not in inner._jit_cache:
            inner._jit_cache[key] = self._s1_cached_fn(nst)
        handle["dp"] = inner._jit_cache[key](
            inner.params, spec["latents"], spec["mem"], spec["cur"],
            spec["rng"])

    def _s1_navdp_prepare(self, rgb, depth, latents,
                          num_sample_trajs: int) -> Dict[str, Any]:
        """Host prep + uploads for one cohort's batched NavDP System-1
        WITHOUT dispatching. The async head consumes memory_size=2
        [memory, current] RGBD pairs (navdp.py:197-253), so inputs use the
        explicit-pairs form; pixels cross the link as uint8 and are
        /255-normalized on device, exactly like the single-stream path
        (policy.py s1_step_latent navdp branch). The spec goes to
        `_s1_dispatch` (per-cohort) or `s1_grouped_dispatch` (shared_s1)."""
        cfg = self.cfg
        self._rng, sub = jax.random.split(self._rng)
        B = latents.shape[0]
        Bp = self._pow2_bucket(B)
        spec: Dict[str, Any] = {
            "handle": {"B": B, "Bp": Bp, "nst": num_sample_trajs},
            "rng": sub, "latents": self._pad_rows(jnp.asarray(latents), Bp),
            "Bp": Bp, "nst": num_sample_trajs, "policy": self,
        }
        if "async" not in cfg.system1:
            spec["mode"] = "navdp_noimg"
            return spec
        assert rgb is not None and depth is not None and rgb.ndim == 5, (
            "navdp_async batched S1 needs rgb (B,2,H,W,3) + depth "
            f"(B,2,H,W,1) pairs, got rgb "
            f"{None if rgb is None else rgb.shape}")
        rgb_u8 = np.asarray(rgb, np.uint8)
        depth_f = np.asarray(depth, np.float32)
        if Bp != B:
            rgb_u8 = np.concatenate(
                [rgb_u8, np.repeat(rgb_u8[:1], Bp - B, axis=0)], axis=0)
            depth_f = np.concatenate(
                [depth_f, np.repeat(depth_f[:1], Bp - B, axis=0)], axis=0)
        spec["mode"] = "navdp"
        spec["rgb"] = jnp.asarray(rgb_u8)
        spec["depth"] = jnp.asarray(depth_f)
        spec["hw"] = tuple(rgb_u8.shape[1:])
        return spec

    def _s1_grouped_navdp_fn(self, num_sample_trajs: int,
                             sizes: Tuple[int, ...], mode: str):
        """One NavDP denoise program over several cohorts' stacked rows.
        Unlike the nextdit flow-matching head (deterministic Euler given
        x_init), the NavDP DDPM loop also injects per-step ancestral noise,
        so bit-equality with per-cohort dispatch needs BOTH draws made per
        cohort block from that cohort's own key: x_init from rngs[g] and
        step noises from fold_in(rngs[g], 1) — exactly what
        generate_traj_navdp_batched does internally for a single cohort."""
        inner = self.inner
        nst = num_sample_trajs

        def draws(mdl, rngs):
            P = mdl.navdp.predict_size
            T = len(mdl.navdp.scheduler.timesteps())
            x_init = jnp.concatenate([
                jax.random.normal(rngs[g], (sz * nst, P, 3))
                for g, sz in enumerate(sizes)])
            step_noises = jnp.concatenate([
                jax.random.normal(jax.random.fold_in(rngs[g], 1),
                                  (T, sz * nst, P, 3))
                for g, sz in enumerate(sizes)], axis=1)
            return x_init, step_noises

        if mode == "navdp_noimg":
            def fn(p, lat, rngs):
                def run(mdl):
                    x_init, zs = draws(mdl, rngs)
                    return mdl.generate_traj_navdp_batched(
                        lat, rng=rngs[0], sample_num=nst,
                        x_init=x_init, step_noises=zs)

                return inner.model.apply({"params": p}, method=run)

            return jax.jit(fn)

        def fn(p, lat, im, de, rngs):
            def run(mdl):
                x_init, zs = draws(mdl, rngs)
                return mdl.generate_traj_navdp_batched(
                    lat, im.astype(jnp.float32) / 255.0, de,
                    rng=rngs[0], sample_num=nst,
                    x_init=x_init, step_noises=zs)

            return inner.model.apply({"params": p}, method=run)

        return jax.jit(fn)

    def s1_collect(self, handle: Dict[str, Any]) -> List[S1Output]:
        """Fetch + discretize the results of an `s1_submit`."""
        dp = np.asarray(handle["dp"])
        return self._s1_outputs(dp, handle["B"], handle["Bp"], handle["nst"])

    def s1_step_latent(self, rgb: np.ndarray, latents,
                       num_sample_trajs: int = 32,
                       slot_ids: Optional[List[int]] = None,
                       depth: Optional[np.ndarray] = None) -> List[S1Output]:
        """Blocking batched System-1 denoise (see `s1_submit`)."""
        return self.s1_collect(self.s1_submit(rgb, latents, num_sample_trajs,
                                              slot_ids, depth=depth))

    def _s1_outputs(self, dp: np.ndarray, B: int, Bp: int,
                    num_sample_trajs: int) -> List[S1Output]:
        P = dp.shape[-2]
        dp = dp.reshape(Bp, num_sample_trajs, P, 3)
        outs = []
        for i in range(B):
            action_list = [a for a in traj_to_actions(dp[i]) if a != 0]
            outs.append(S1Output(idx=action_list[:4], trajectory=dp[i]))
        return outs


def s1_grouped_dispatch(specs: List[Dict[str, Any]]) -> None:
    """Complete `s1_prepare` specs from SEVERAL cohorts with one denoise
    program per (mode, sizes, hw, num_sample_trajs) bucket. The System-1
    program is dominated by depth-sequential small ops (10 Euler steps x
    12 DiT layers at 384d) whose device time barely grows with rows, so
    running G cohorts' rows in one program costs far less than G programs.
    Row-for-row SEMANTICALLY identical to per-cohort `_s1_dispatch`: each
    cohort block keeps its own rng normal draw (x_init injection), the DiT
    conditioning layout is batch-major (nextdit.py:156), and every op is
    row-independent — the only difference is float-epsilon from GEMM
    reduction blocking at the larger batch (~1e-6 on trajectories,
    asserted tight in tests/test_serving_shared_s1.py)."""
    buckets: Dict[tuple, list] = {}
    for s in specs:
        if s is None:
            continue
        buckets.setdefault((s["mode"], s.get("hw"), s["nst"]), []).append(s)
    for (mode, hw, nst), items in buckets.items():
        if len(items) == 1:  # nothing to group
            items[0]["policy"]._s1_dispatch(items[0])
            continue
        pol = items[0]["policy"]
        inner = pol.inner
        sizes = tuple(s["Bp"] for s in items)
        rngs = jnp.stack([s["rng"] for s in items])
        lat = jnp.concatenate([s["latents"] for s in items])
        key = f"s1G_{mode}_{sizes}_{hw}_{nst}"
        mem_feats = None
        if mode.startswith("navdp"):
            if key not in inner._jit_cache:
                inner._jit_cache[key] = pol._s1_grouped_navdp_fn(
                    nst, sizes, mode)
            if mode == "navdp":
                im = jnp.concatenate([s["rgb"] for s in items])
                de = jnp.concatenate([s["depth"] for s in items])
                dp = inner._jit_cache[key](inner.params, lat, im, de, rngs)
            else:
                dp = inner._jit_cache[key](inner.params, lat, rngs)
        elif mode == "noimg":
            if key not in inner._jit_cache:
                inner._jit_cache[key] = pol._s1_grouped_fn(nst, sizes, mode)
            dp = inner._jit_cache[key](inner.params, lat, rngs)
        else:
            if key not in inner._jit_cache:
                inner._jit_cache[key] = pol._s1_grouped_fn(nst, sizes, mode)
            mem = jnp.concatenate([s["mem"] for s in items])
            cur = jnp.concatenate([s["cur"] for s in items])
            out = inner._jit_cache[key](inner.params, lat, mem, cur, rngs)
            dp, mem_feats = out if mode == "full" else (out, None)
        off_rows = off_b = 0
        for s in items:
            Bp = s["Bp"]
            s["handle"]["dp"] = dp[off_rows: off_rows + Bp * nst]
            if mode == "full":
                for r, sl in enumerate(s["slots"]):
                    sl.s1_mem_feats = mem_feats[off_b + r]
            off_rows += Bp * nst
            off_b += Bp


def shared_decode_handles(inner, n_query: int,
                          handles: List[Dict[str, Any]]) -> None:
    """Complete `s2_prefill_submit` handles with ONE grouped decode +
    traj-latent program per (prompt-bucket T, max_new_tokens) set: the
    greedy decode streams the full decoder weights once per token
    REGARDLESS of batch, so decoding every cohort together costs ~1/G of
    the per-cohort weight traffic (the decode while-loop is the
    second-largest device phase after prefill). Each handle is rewritten
    in place into the `s2_collect` format; per-row results are
    bit-identical to the per-cohort fused path
    (tests/test_serving_shared_decode.py)."""
    buckets: Dict[tuple, list] = {}
    for h in handles:
        if "pgroups" not in h:
            continue
        for g in h["pgroups"]:
            key = (g["T"], h["max_new_tokens"])
            buckets.setdefault(key, []).append((h, g))
    for (T, mnt), items in buckets.items():
        trees = [g["caches"] for _, g in items]
        first = jnp.concatenate([g["first"] for _, g in items])
        # device copies stashed by s2_prefill_submit (content-cached) —
        # no per-flush re-upload. NOT dict.get(key, jnp.asarray(...)):
        # python evaluates a .get default eagerly, which would pay the
        # upload anyway and discard it.
        deltas = jnp.concatenate(
            [g["deltas_d"] if "deltas_d" in g else jnp.asarray(g["deltas"])
             for _, g in items])
        plen = jnp.concatenate(
            [g["plen_d"] if "plen_d" in g else jnp.asarray(g["prompt_len"])
             for _, g in items])
        sizes = tuple(g["first"].shape[0] for _, g in items)
        key = f"gtail_{T}_{sizes}_{mnt}"
        if key not in inner._jit_cache:
            inner._jit_cache[key] = inner._grouped_tail_fn(mnt, n_query)
        tokens, _lengths, latents = inner._jit_cache[key](
            inner.params, trees, first, deltas, plen)
        r = 0
        for h, g in items:
            Bg = g["first"].shape[0]
            # lengths re-derived host-side in s2_collect (see s2_submit)
            h.setdefault("pending", []).append(
                (g["rows"], tokens[r:r + Bg], latents[r:r + Bg]))
            r += Bg
    for h in handles:
        h.pop("pgroups", None)


class SharedDecodePool:
    """Cross-cohort grouped-decode coordinator for coroutine schedulers
    (the vln_pipelined evaluator). Agents with a pool attached submit
    PREFILL-only S2 programs and register the handles here; the first
    agent to resume calls `flush()`, which dispatches one grouped
    decode+latents program covering every pending cohort. Safe because
    the scheduler advances all cohorts past their submit-yield before
    resuming any of them (round-robin, one hop per pass)."""

    def __init__(self, inner, n_query: int) -> None:
        self.inner = inner
        self.n_query = n_query
        self.pending: List[Dict[str, Any]] = []

    def add(self, handle: Dict[str, Any]) -> None:
        self.pending.append(handle)

    def flush(self) -> None:
        if self.pending:
            shared_decode_handles(self.inner, self.n_query, self.pending)
            self.pending = []


class SharedS1Pool:
    """Cross-cohort grouped-System-1 coordinator for coroutine schedulers
    (the vln_pipelined evaluator) — the S1 counterpart of
    SharedDecodePool. Agents with a pool attached `s1_prepare` their
    denoise and register the spec here; the first agent to resume calls
    `flush()`, which dispatches one grouped DiT program per
    (mode, sizes, hw, nst) bucket covering every pending cohort.

    Compile-shape note: the grouped program is specialized on the tuple of
    cohort batch sizes, so cohorts whose live-slot counts drift apart
    compile new shapes (bounded by the pow-2 slot bucketing). Uniform
    cohorts — the serving steady state — reuse one compile."""

    def __init__(self) -> None:
        self.pending: List[Dict[str, Any]] = []

    def add(self, spec: Dict[str, Any]) -> None:
        self.pending.append(spec)

    def flush(self) -> None:
        if self.pending:
            s1_grouped_dispatch(self.pending)
            self.pending = []


def _split_frames(frames):
    """frames_fn may return rgb alone (nextdit cohorts) or an
    (rgb, depth) tuple (navdp cohorts, RGBD [memory, current] pairs)."""
    return frames if isinstance(frames, tuple) else (frames, None)


class PipelinedN1Server:
    """Double-buffered multi-cohort serving, single host thread.

    One blocking cohort leaves the chip idle whenever the host is busy:
    building prompts, uploading frames over the host link, parsing decoded
    text, waiting on result fetches. jax dispatch is ASYNCHRONOUS (<1 ms:
    calls enqueue device work and return futures), so a single-threaded
    scheduler interleaves cohorts by phase — submit cohort A's program,
    then do cohort B's host work while A computes, collect A, and so on.
    The XLA stream executes the cohorts' programs back-to-back and the
    chip idles only when every cohort is in a host phase. No semantics
    change: cohorts are disjoint episode sets, and per-stream results are
    identical to blocking single-cohort serving
    (tests/test_serving_batched.py).

    Host THREADS were tried for this and rejected: on networked-TPU
    backends the client serializes dispatches under a lock and the GIL
    contends the host phases, benching ~2x SLOWER than blocking serving.
    Phase interleaving on one thread gets the overlap without either lock.

    The reference cannot express any of this: its evaluator binds one
    episode to one GPU rank and blocks on every transfer
    (habitat_env.py:72, internvla_n1_agent.py step loop).

    All cohorts share ONE `InternVLAN1Policy` (params + jit caches), so
    extra cohorts cost no compiles and no HBM beyond their KV caches.
    """

    def __init__(self, model, params, cfg, batch_size: int, cohorts: int = 2,
                 tokenizer=None) -> None:
        self.inner = InternVLAN1Policy(model, params, cfg, tokenizer=tokenizer)
        self.cfg = cfg
        self.batch_size = batch_size
        self.cohorts = [
            BatchedN1Policy(model, params, cfg, batch_size, inner=self.inner)
            for _ in range(cohorts)
        ]

    def serve_macro_cycle(
        self,
        frames_fn,
        max_new_tokens: int = 128,
        num_sample_trajs: int = 32,
        s1_calls: int = 2,
        latent_fallback=None,
    ):
        """One phase-interleaved macro-cycle over all cohorts.

        frames_fn(cohort_idx, phase) -> (B, H, W, 3) uint8 current frames
        for that cohort (phase 0 = S2 step, 1.. = S1 micro-steps) — in
        production this is where simulator observations enter, and the env
        stepping for one cohort overlaps the other cohorts' device work.
        latent_fallback(cohort_idx) -> (B, n_q, D) used for slots whose S2
        emitted no latent (e.g. discrete-action steps).
        Returns per-cohort (s2_outputs, [s1_outputs per call]).
        """
        n = len(self.cohorts)
        s2h = [None] * n
        s2out = [None] * n
        lat = [None] * n
        s1res: List[List[Any]] = [[] for _ in range(n)]

        for ci, pol in enumerate(self.cohorts):  # device fills with S2 work
            s2h[ci] = pol.s2_submit(frames_fn(ci, 0), max_new_tokens)
        s1h = [None] * n
        for ci, pol in enumerate(self.cohorts):
            s2out[ci] = pol.s2_collect(s2h[ci])  # blocks; others compute
            rows = []
            for o in s2out[ci]:
                if o.output_latent is not None:
                    rows.append(o.output_latent)
                elif latent_fallback is not None:
                    rows.append(latent_fallback(ci)[o.idx:o.idx + 1])
                else:
                    rows.append(jnp.zeros(
                        (1, self.cfg.n_query, self.cfg.text.hidden_size),
                        jnp.bfloat16))
            lat[ci] = jnp.concatenate(rows, axis=0)
            rgb_f, depth_f = _split_frames(frames_fn(ci, 1))
            s1h[ci] = pol.s1_submit(rgb_f, lat[ci], num_sample_trajs,
                                    depth=depth_f)
        for call in range(1, s1_calls + 1):
            nxt = [None] * n
            for ci, pol in enumerate(self.cohorts):
                s1res[ci].append(pol.s1_collect(s1h[ci]))
                if call < s1_calls:
                    rgb_f, depth_f = _split_frames(frames_fn(ci, call + 1))
                    nxt[ci] = pol.s1_submit(rgb_f, lat[ci],
                                            num_sample_trajs, depth=depth_f)
            s1h = nxt
        return [(s2out[ci], s1res[ci]) for ci in range(n)]

    def _shared_decode(self, handles: List[Dict[str, Any]]) -> None:
        shared_decode_handles(self.inner, self.cfg.n_query, handles)

    def serve_stream(self, frames_fn, n_cycles: int,
                     max_new_tokens: int = 128, num_sample_trajs: int = 32,
                     s1_calls: int = 2, on_cycle=None,
                     shared_decode: bool = False,
                     shared_s1: bool = False,
                     host_stats: Optional[Dict[str, list]] = None):
        """Continuous pipelined serving for n_cycles macro-cycles.

        Unlike `serve_macro_cycle`, cycle boundaries are pipelined too: as
        soon as a cohort's last S1 of cycle t is collected, its cycle t+1
        S2 is submitted — the device queue never drains, so steady-state
        wall time approaches the pure device time of the work.
        frames_fn(cohort_idx, cycle_idx, phase) -> (B, H, W, 3) frames;
        on_cycle(cohort_idx, cycle_idx, s2_outputs, s1_results) is called
        as each cohort finishes a cycle (bookkeeping hook).
        shared_s1=True batches every cohort's System-1 denoise of a given
        micro-step into ONE grouped program (`s1_grouped_dispatch`),
        row-identical to per-cohort dispatch.

        host_stats: optional dict collecting per-call HOST durations in
        seconds under keys s2_submit/s2_collect/s1_submit/s1_collect
        (+ shared_decode). Submit durations are host prep + uploads +
        dispatch; collect durations include any device wait. Comparing
        their sums against the stream wall time attributes the
        device-idle gap (host-bound vs device-bound serving).
        """
        import time as _time

        n = len(self.cohorts)
        s2h = [None] * n
        lat = [None] * n
        s2out = [None] * n
        s1res: List[List[Any]] = [[] for _ in range(n)]

        if host_stats is None:
            def timed(key, fn, *a, **kw):
                return fn(*a, **kw)
        else:
            def timed(key, fn, *a, **kw):
                t0 = _time.perf_counter()
                out = fn(*a, **kw)
                host_stats.setdefault(key, []).append(
                    _time.perf_counter() - t0)
                return out

        def submit_s2(ci, t):
            if shared_decode:
                s2h[ci] = timed("s2_submit",
                                self.cohorts[ci].s2_prefill_submit,
                                frames_fn(ci, t, 0), max_new_tokens)
            else:
                s2h[ci] = timed("s2_submit", self.cohorts[ci].s2_submit,
                                frames_fn(ci, t, 0), max_new_tokens)

        def latents_of(ci):
            rows = []
            for o in s2out[ci]:
                if o.output_latent is not None:
                    rows.append(o.output_latent)
                else:
                    rows.append(jnp.zeros(
                        (1, self.cfg.n_query, self.cfg.text.hidden_size),
                        jnp.bfloat16))
            return jnp.concatenate(rows, axis=0)

        def submit_s1(ci, t, call):
            """Per-cohort S1 dispatch, or prepare-only under shared_s1."""
            rgb_f, depth_f = _split_frames(frames_fn(ci, t, call))
            if shared_s1:
                return timed("s1_submit", self.cohorts[ci].s1_prepare,
                             rgb_f, lat[ci], num_sample_trajs,
                             depth=depth_f)
            return timed("s1_submit", self.cohorts[ci].s1_submit,
                         rgb_f, lat[ci], num_sample_trajs, depth=depth_f)

        def flush_s1(specs):
            """Under shared_s1: one grouped program for every cohort's
            prepared S1 of this micro-step."""
            if not shared_s1:
                return specs
            timed("s1_grouped", s1_grouped_dispatch, specs)
            return [s["handle"] for s in specs]

        for ci in range(n):
            submit_s2(ci, 0)
        for t in range(n_cycles):
            if shared_decode:
                # every cohort's prefill for cycle t is dispatched; one
                # grouped program decodes them all (async dispatch)
                timed("shared_decode", self._shared_decode, s2h)
            s1h = [None] * n
            for ci, pol in enumerate(self.cohorts):
                s2out[ci] = timed("s2_collect", pol.s2_collect, s2h[ci])
                lat[ci] = latents_of(ci)
                s1res[ci] = []
                s1h[ci] = submit_s1(ci, t, 1)
            s1h = flush_s1(s1h)
            for call in range(1, s1_calls + 1):
                nxt = [None] * n
                for ci, pol in enumerate(self.cohorts):
                    s1res[ci].append(
                        timed("s1_collect", pol.s1_collect, s1h[ci]))
                    if call < s1_calls:
                        nxt[ci] = submit_s1(ci, t, call + 1)
                    else:
                        # cycle boundary pipelined: next cycle's S2 goes
                        # into the device queue before other cohorts'
                        # current-cycle collects
                        if t + 1 < n_cycles:
                            if on_cycle is not None:
                                on_cycle(ci, t, s2out[ci], s1res[ci])
                            submit_s2(ci, t + 1)
                        elif on_cycle is not None:
                            on_cycle(ci, t, s2out[ci], s1res[ci])
                if call < s1_calls:
                    nxt = flush_s1(nxt)
                s1h = nxt
