"""InternVLA-N1 inference policy wrapper — System-2 step + System-1 step.

Parity target: reference internnav/model/basemodel/internvla_n1/
internvla_n1_policy.py (InternVLAN1Net:1-215): maintains rgb/pose history;
s2_step builds the Qwen chat prompt with history frames sampled via
np.linspace(0, t-1, num_history) (:130), runs greedy generate (max 128
tokens) and regex-parses either pixel-goal coordinates or the discrete
action arrows {STOP, ↑, ←, →, ↓} (:78-85, 184-197); pixel-goal branch runs
`generate_latents`; s1_step_latent runs `generate_traj` then
traj_to_actions / chunk_token (:200-215). The conjunction is pinned to
conjunctions[0] (parity note in SURVEY.md §7 "Non-determinism").

Tokenization: any object with encode(str)->list[int] / decode(list[int])
works; `SimpleTokenizer` is the dependency-free fallback used by tests
(real checkpoints use the HF Qwen tokenizer via transformers).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.basemodel.internvla_n1.model import (
    InternVLAN1Config,
    InternVLAN1Model,
)
from internnav_tpu.model.basemodel.internvla_n1.qwen_text import greedy_generate
from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
    preprocess_images,
    preprocess_images_device,
    rotary_table,
    vision_indices,
)
from internnav_tpu.model.utils.vln_utils import (
    S1Output,
    S2Output,
    chunk_token,
    parse_actions,
    traj_to_actions,
)
from internnav_tpu.ops.rope import get_rope_index_25

IM_START, IM_END = "<|im_start|>", "<|im_end|>"
VISION_START, VISION_END = "<|vision_start|>", "<|vision_end|>"


class SimpleTokenizer:
    """Whitespace tokenizer with Qwen special-token ids — a test stand-in
    with the same interface as the HF tokenizer."""

    QWEN_SPECIALS = {
        "<|im_start|>": 151644, "<|im_end|>": 151645,
        "<|vision_start|>": 151652, "<|vision_end|>": 151653,
        "<|image_pad|>": 151655, "<|traj_pad|>": 151667,
    }

    def __init__(self, vocab_size: int = 151680):
        self.vocab_size = vocab_size
        if vocab_size > max(self.QWEN_SPECIALS.values()):
            self.SPECIALS = dict(self.QWEN_SPECIALS)
        else:
            # tiny-vocab configs: compact special ids at the top of the vocab
            self.SPECIALS = {
                name: vocab_size - len(self.QWEN_SPECIALS) + i
                for i, name in enumerate(self.QWEN_SPECIALS)
            }
        self.eos_token_id = self.SPECIALS["<|im_end|>"]
        self._cache: Dict[str, int] = {}

    def encode(self, text: str) -> List[int]:
        pattern = "|".join(re.escape(s) for s in self.SPECIALS)
        out = []
        for piece in re.split(f"({pattern})", text):
            if not piece:
                continue
            if piece in self.SPECIALS:
                out.append(self.SPECIALS[piece])
            else:
                for w in piece.split():
                    # crc32, not hash(): python's str hash is randomized
                    # per process (PYTHONHASHSEED), which made test prompts
                    # nondeterministic across runs
                    out.append(self._cache.setdefault(
                        w, (zlib.crc32(w.encode()) % (self.vocab_size - 10)) + 3))
        return out

    def decode(self, ids) -> str:
        inv = {v: k for k, v in self.SPECIALS.items()}
        return " ".join(inv.get(int(i), f"tok{int(i)}") for i in ids
                        if int(i) not in (self.eos_token_id,))


def _infer_s1_hw(params) -> Optional[int]:
    """Resolution the S1 DinoViT pos embeds were built for, read off the
    param tree (pos_embed is (1, 1 + (hw/14)^2, dim); encoder/vit.py:72).
    None when no DinoViT is present (e.g. plain `nextdit` without the
    async memory encoder)."""
    import math

    def walk(tree):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                if k == "pos_embed" and hasattr(v, "shape") \
                        and len(v.shape) == 3:
                    g = int(round(math.sqrt(v.shape[1] - 1)))
                    if g * g == v.shape[1] - 1:
                        return g * 14
                    continue
                found = walk(v)
                if found:
                    return found
        return None

    return walk(params)


def _resize_frames(frames: np.ndarray, hw: int) -> np.ndarray:
    """Host-side resize of (..., H, W, C) frame stacks to (hw, hw) with
    PIL's default filter — what the reference agent does to every S1
    memory/current frame (internvla_n1_agent.py:310-319). No-op when the
    frames already match."""
    arr = np.asarray(frames)
    if arr.shape[-3] == hw and arr.shape[-2] == hw:
        return arr
    from PIL import Image

    lead, c = arr.shape[:-3], arr.shape[-1]
    flat = arr.reshape((-1,) + arr.shape[-3:])
    out = np.empty((flat.shape[0], hw, hw, c), arr.dtype)
    for i, f in enumerate(flat):
        if c == 1:  # PIL has no 1-channel HxWx1 mode; squeeze (depth)
            out[i, ..., 0] = np.asarray(
                Image.fromarray(f[..., 0]).resize((hw, hw)))
        else:
            out[i] = np.asarray(Image.fromarray(f).resize((hw, hw)))
    return out.reshape(lead + (hw, hw, c))


class InternVLAN1Policy:
    """Holds (model, params) + host-side prompt/history orchestration."""

    name = "InternVLAN1_Policy"
    conjunctions = [
        "you can see ",
        "in front of you is ",
        "there is ",
        "you can spot ",
        "you are toward the ",
        "ahead of you is ",
        "in your sight is ",
    ]
    #: reference init_prompts (internvla_n1_policy.py:61-66): the absolute
    #: pixel-goal task prompt
    SYSTEM_PROMPT = (
        "You are an autonomous navigation assistant. Your task is to "
        "<instruction>. Where should you go next to stay on track? Please "
        "output the next waypoint's coordinates in the image. Please output "
        "STOP when you have successfully completed the task."
    )
    #: the Qwen chat template injects this system message when the first
    #: message isn't a system turn
    CHAT_SYSTEM = "You are a helpful assistant."

    def __init__(self, model: InternVLAN1Model, params, cfg: InternVLAN1Config,
                 tokenizer=None):
        self.model = model
        self.params = params
        self.cfg = cfg
        #: S1 frame resolution the loaded pos embeds require; frames of any
        #: other camera resolution are host-resized in s1_step_latent
        #: (reference agent parity: internvla_n1_agent.py:310-319 resizes
        #: every S1 frame to 224). cfg wins; else inferred from the actual
        #: DinoViT pos_embed leaf so from_pretrained of any-resolution
        #: checkpoints stays self-consistent.
        self.s1_image_hw = getattr(cfg, "s1_image_hw", None) \
            or _infer_s1_hw(params)
        # standalone text model sharing the "language_model" params subtree
        # (setup-defined submodules aren't reachable outside apply)
        from internnav_tpu.model.basemodel.internvla_n1.qwen_text import QwenTextModel

        self.text_model = QwenTextModel(cfg.text)
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size)
        self.num_history = cfg.num_history
        self.reset()
        self._jit_cache: Dict[str, Any] = {}

    @property
    def stop_token_ids(self) -> tuple:
        """THE greedy-decode stop set (reference stops on <|im_end|> only,
        internvla_n1_policy.py:169-176). Single definition shared by every
        device decode program AND the host-side lengths derivation in
        serving.s2_collect — they must agree or decoded text silently grows
        trailing stop/pad tokens."""
        return (self.tokenizer.eos_token_id,)

    # ------------------------------------------------------------ lifecycle
    def save_pretrained(self, path: str) -> None:
        """Write a native checkpoint dir: config.json (informational) +
        params.msgpack. int4 leaves are stored as int8 values (lossless —
        values live in [-8, 7]; msgpack has no 4-bit type) and restored to
        int4 by from_pretrained via the init tree's dtypes."""
        import dataclasses as _dc
        import json as _json
        import os as _os

        import jax
        from flax import serialization

        _os.makedirs(path, exist_ok=True)
        info = {
            "policy": self.name,
            "system1": self.cfg.system1,
            "weight_dtype": getattr(self.cfg.text, "weight_dtype", "bf16"),
            "text": {k: str(v) for k, v in
                     _dc.asdict(self.cfg.text).items()},
            "note": "config.json is informational; pass the "
                    "InternVLAN1Config to from_pretrained",
        }
        with open(_os.path.join(path, "config.json"), "w") as f:
            _json.dump(info, f, indent=2)
        tree = jax.tree_util.tree_map(
            lambda a: np.asarray(a.astype(jnp.int8))
            if hasattr(a, "dtype") and a.dtype == jnp.int4 else np.asarray(a),
            self.params)
        with open(_os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(tree))

    @classmethod
    def from_pretrained(cls, path: str, cfg: InternVLAN1Config,
                        tokenizer=None,
                        image_hw: int = 56) -> "InternVLAN1Policy":
        """Load a native save_pretrained dir. Leaf dtypes (incl. int4 and
        bf16) are restored from an eval_shape of the init — no full random
        init is materialized."""
        import os as _os

        import jax
        from flax import serialization

        import json as _json

        info_path = _os.path.join(path, "config.json")
        if _os.path.exists(info_path):
            with open(info_path) as f:
                info = _json.load(f)
            saved_wdt = info.get("weight_dtype")
            want_wdt = getattr(cfg.text, "weight_dtype", "bf16")
            if saved_wdt and saved_wdt != want_wdt:
                raise ValueError(
                    f"checkpoint at {path} was saved with "
                    f"weight_dtype={saved_wdt!r} but the config asks for "
                    f"{want_wdt!r} — pass a matching InternVLAN1Config "
                    f"(e.g. qwen25vl_7b(weight_dtype={saved_wdt!r})) or "
                    "re-convert the checkpoint")
        with open(_os.path.join(path, "params.msgpack"), "rb") as f:
            loaded = serialization.msgpack_restore(f.read())
        model = InternVLAN1Model(cfg)
        shapes = jax.eval_shape(
            lambda rng: cls._init_params(model, cfg, rng, image_hw),
            jax.random.PRNGKey(0))

        def restore(sd, leaf):
            a = jnp.asarray(leaf)
            if tuple(a.shape) != tuple(sd.shape):
                raise ValueError(
                    f"checkpoint leaf shape {a.shape} != model {sd.shape}")
            return a.astype(sd.dtype)

        params = jax.tree_util.tree_map(restore, shapes, loaded)
        if tokenizer is None:
            # tokenizer assets are copied into the dir by
            # scripts/tools/convert_checkpoint.py — a real checkpoint must
            # NOT silently fall back to the hash SimpleTokenizer
            try:
                from internnav_tpu.model.utils.tokenization import (
                    load_hf_tokenizer,
                )

                tokenizer = load_hf_tokenizer(path)
            except Exception:
                tokenizer = None
        return cls(model, params, cfg, tokenizer=tokenizer)

    @classmethod
    def from_pretrained_torch(cls, path: str, cfg: InternVLAN1Config,
                              tokenizer=None) -> "InternVLAN1Policy":
        """Load a reference-format InternVLA-N1 torch checkpoint directory
        (safetensors / pytorch_model.bin, sharded or not; reference
        tolerant-loading semantics internvla_n1_policy.py:33-38) into a
        ready policy. Weights cast to cfg.text.dtype; when
        cfg.text.weight_dtype == 'int8' the decoder projections are
        quantized to the resident W8A8 deployment format."""
        import jax.numpy as jnp

        from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
            quantize_qwen_text_params,
        )
        from internnav_tpu.model.weights.convert import (
            convert_internvla_n1,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(path)
        params = convert_internvla_n1(sd)
        dtype = cfg.text.dtype
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype)
            if np.asarray(a).dtype in (np.float32, np.float64) else jnp.asarray(a),
            params)
        wdt = getattr(cfg.text, "weight_dtype", "bf16")
        if wdt in ("int8", "int4"):
            params["language_model"] = quantize_qwen_text_params(
                params["language_model"],
                weight_bits=4 if wdt == "int4" else 8,
                group_size=getattr(cfg.text, "quant_group_size", None))
        model = InternVLAN1Model(cfg)
        if tokenizer is None:
            try:
                from internnav_tpu.model.utils.tokenization import (
                    load_hf_tokenizer,
                )

                tokenizer = load_hf_tokenizer(path)
            except Exception:
                tokenizer = None  # SimpleTokenizer fallback in __init__
        return cls(model, params, cfg, tokenizer=tokenizer)

    @classmethod
    def build(cls, cfg: Optional[InternVLAN1Config] = None,
              rng: Optional[jax.Array] = None, image_hw: int = 56) -> "InternVLAN1Policy":
        cfg = cfg or InternVLAN1Config.tiny()
        model = InternVLAN1Model(cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params = cls._init_params(model, cfg, rng, image_hw)
        return cls(model, params, cfg)

    @staticmethod
    def _init_params(model, cfg, rng, image_hw):
        B, T = 1, 8
        ids = np.full((B, T), 5, np.int64)
        ids[0, 2] = cfg.image_token_index
        ids[0, 6] = cfg.traj_token_index
        pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
        imgs = np.zeros((1, image_hw, image_hw, 3), np.float32)
        patches, grid = preprocess_images(imgs, cfg.vision)
        idx = vision_indices(
            (cfg.vision.patch_size, cfg.vision.spatial_merge_size, cfg.vision.window_size),
            tuple(map(tuple, grid.tolist())),
        )
        cos, sin = rotary_table(idx["pos_ids"], cfg.vision.hidden_size // cfg.vision.num_heads)
        # S1 pos embeds are resolution-fixed (DinoViT pos_embed); the
        # flagship pins 224 via cfg.s1_image_hw so from_pretrained's
        # eval_shape matches real converted checkpoints regardless of the
        # (S2-only) image_hw argument
        s = getattr(cfg, "s1_image_hw", None) or image_hw

        def init_fn(mdl):
            img_tokens = mdl.encode_vision(
                jnp.asarray(patches), jnp.asarray(cos), jnp.asarray(sin),
                jnp.asarray(idx["window_segments"]), jnp.asarray(idx["full_segments"]),
                jnp.asarray(idx["window_index"]), jnp.asarray(idx["reverse_index"]),
                window_block=idx["window_block"], full_block=idx["full_block"],
            )
            e = mdl.embed_multimodal(jnp.asarray(ids), img_tokens)
            logits, hidden, _ = mdl.prefill(e, pos)
            hs = hidden[:, -cfg.n_query:, :]
            if "nextdit" in cfg.system1:
                imdp = jnp.zeros((B, 2, s, s, 3))
                return mdl.traj_loss_nextdit(
                    hs, jnp.zeros((B, cfg.predict_step_nums, 3)),
                    jax.random.PRNGKey(1),
                    imdp if "async" in cfg.system1 else None,
                )
            ddp = jnp.zeros((B, 2, s, s, 1))
            imdp = jnp.zeros((B, 2, s, s, 3))
            eps, noise = mdl.navdp.forward_vlm_traj(
                hs, imdp, ddp, jnp.zeros((B, mdl.navdp.predict_size, 3)),
                jax.random.PRNGKey(1),
            )
            return jnp.mean(eps)

        return model.init(rng, method=init_fn)["params"]

    #: cache per-frame vision tokens across S2 steps. The ViT encodes each
    #: image independently (per-image window/full segments,
    #: qwen_vision.vision_indices), and the reference re-encodes all
    #: num_history+1 frames every step — caching is mathematically exact
    #: and cuts the vision tower (and the patch upload) to 1/9 per step.
    cache_vision: bool = True

    def reset(self) -> None:
        self.rgb_list: List[np.ndarray] = []
        self.pose_list: List[np.ndarray] = []
        self.episode_idx = 0
        self.llm_output = ""
        self.input_images: List[np.ndarray] = []
        self._vision_cache: Dict[int, Any] = {}
        self._rng = jax.random.PRNGKey(0)

    # --------------------------------------------------------------- vision
    CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
    CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

    def _vision_host_indices(self, n: int, h: int, w: int):
        """Memoized window/rope index tables (pure functions of the image
        grid; recomputing them per call costs ~20 ms of host time)."""
        cfg = self.cfg
        key = f"visidx_{n}_{h}_{w}"
        if key not in self._jit_cache:
            p = cfg.vision.patch_size
            grid = np.tile(np.asarray([[1, h // p, w // p]], np.int64), (n, 1))
            idx = vision_indices(
                (p, cfg.vision.spatial_merge_size, cfg.vision.window_size),
                tuple(map(tuple, grid.tolist())),
            )
            cos, sin = rotary_table(
                idx["pos_ids"], cfg.vision.hidden_size // cfg.vision.num_heads)
            self._jit_cache[key] = (grid, tuple(
                jnp.asarray(a) for a in (
                    cos, sin, idx["window_segments"], idx["full_segments"],
                    idx["window_index"], idx["reverse_index"])),
                (idx["window_block"], idx["full_block"]))
        return self._jit_cache[key]

    def _encode_images(self, images: np.ndarray):
        """(N, H, W, 3) uint8 → (N_tok, D) vision tokens. Pixels cross the
        host→device link as uint8; normalization + patchification run
        on-device (preprocess_images_device)."""
        cfg = self.cfg
        if not isinstance(images, jnp.ndarray):
            images = np.asarray(images)  # jnp stays on device (no fetch)
        n, h, w = images.shape[:3]
        grid, dev_idx, (wblk, fblk) = self._vision_host_indices(n, h, w)
        key = f"vis_{images.shape}"
        if key not in self._jit_cache:
            def fn(p, raw, *a):
                patches = preprocess_images_device(
                    raw, cfg.vision, self.CLIP_MEAN, self.CLIP_STD)
                return self.model.apply({"params": p}, patches, *a,
                                        window_block=wblk, full_block=fblk,
                                        method=self.model.encode_vision)

            self._jit_cache[key] = jax.jit(fn)
        tokens = self._jit_cache[key](
            self.params, jnp.asarray(images.astype(np.uint8)), *dev_idx)
        return tokens, grid

    # --------------------------------------------------------------- prompt
    def _tokens_per_image(self, image_hw: Tuple[int, int]) -> int:
        m, p = self.cfg.vision.spatial_merge_size, self.cfg.vision.patch_size
        return (image_hw[0] // p // m) * (image_hw[1] // p // m)

    def _build_prompt_ids(self, instruction: str, n_images: int,
                          image_hw: Tuple[int, int]) -> np.ndarray:
        """Qwen chat template with expanded image-token runs.

        Byte-for-byte parity with the reference's
        processor.apply_chat_template path (internvla_n1_policy.py:110-165):
        the user text is built as `<prompt> These are your historical
        observations: <image>\\n...<image>\\n. <conjunction><image>.`, passed
        through split_and_clean (which strips whitespace/newlines around
        the image placeholders), then rendered with the Qwen template —
        default system message first, image placeholders as
        <|vision_start|><|image_pad|>*n<|vision_end|> with no surrounding
        spaces, and a trailing assistant header."""
        from internnav_tpu.model.utils.vln_utils import split_and_clean

        n_img_tok = self._tokens_per_image(image_hw)
        img_block = VISION_START + "<|image_pad|>" * n_img_tok + VISION_END
        value = self.SYSTEM_PROMPT.replace("<instruction>.", instruction)
        history = n_images - 1
        if history > 0:
            value += (" These are your historical observations: "
                      + "<image>\n" * history + ".")
        value += f" {self.conjunctions[0]}<image>."
        body = "".join(img_block if part == "<image>" else part
                       for part in split_and_clean(value))
        text = (f"{IM_START}system\n{self.CHAT_SYSTEM}{IM_END}\n"
                f"{IM_START}user\n{body}{IM_END}\n{IM_START}assistant\n")
        return np.asarray(self.tokenizer.encode(text), np.int64)[None]

    # ------------------------------------------------------------ fused s2
    def _fused_s2_fn(self, max_new_tokens: int, n_q: int):
        """One jitted program: vision encode → embed → prefill+decode →
        latents prefill over [prompt, generated, traj] with pads masked by
        segment ids. A single device round trip per S2 step — the 3-4
        separate dispatches otherwise dominate latency on networked TPUs.

        The prompt arrives right-padded to a length bucket (prompt_len (B,)
        real lengths, prompt_seg marking pads), so one compile serves every
        instruction length within the bucket; generation starts at the last
        REAL token and decode overwrites the pad cache slots, keeping the
        result bit-identical to the unpadded program."""
        model = self.model
        text_model = self.text_model
        cfg = self.cfg
        eos = self.stop_token_ids

        def fn(params, img_tokens, input_ids, pos_ids, rope_deltas,
               prompt_len, prompt_seg):
            embeds = model.apply({"params": params}, input_ids, img_tokens,
                                 method=model.embed_multimodal)
            tokens, lengths, caches = greedy_generate(
                text_model, params["language_model"], embeds, pos_ids,
                max_new_tokens=max_new_tokens, eos_token_ids=eos,
                rope_deltas=rope_deltas, prompt_lengths=prompt_len,
                segment_ids=prompt_seg, return_caches=True,
                extra_cache_slots=n_q,
            )
            B, T = input_ids.shape
            # traj latents via ONE chunked decode of all n_q queries over
            # the generation's KV cache — mathematically identical to the
            # reference's full re-prefill of [prompt, generated, traj]
            # (internvla_n1.py:320-347, which also re-runs the vision
            # tower). The queries are fixed embeddings with no sequential
            # data dependence, so the chunk's stepwise-causal attention
            # equals n_q sequential decode steps while streaming the 7.6 GB
            # decoder weights from HBM once instead of n_q times. Query i
            # sits at real position prompt_len + lengths + i; its K/V write
            # overwrites the stale eos-pad slot at that index.
            q_embeds = model.apply({"params": params}, method=model.traj_queries)
            pos1 = (prompt_len + rope_deltas + lengths)[None, :, None] \
                + jnp.arange(n_q)[None, None, :]
            pos = jnp.broadcast_to(pos1, (3, B, n_q)).astype(jnp.int32)
            e = jnp.broadcast_to(
                q_embeds, (B, n_q, q_embeds.shape[-1])).astype(embeds.dtype)
            latents, caches = text_model.apply(
                {"params": params["language_model"]}, e, pos, caches,
                prompt_len + lengths, method=text_model.decode_chunk,
            )
            return tokens, lengths, latents

        return jax.jit(fn)

    # ---------------------------------------------------- split s2 (grouped)
    def _prefill_s2_fn(self, max_new_tokens: int, n_q: int):
        """Prefill-only half of `_fused_s2_fn`: vision encode → embed →
        prefill → first greedy token. Returns (first_tok (B,), caches
        padded to T + max_new_tokens + n_q). Paired with
        `_grouped_tail_fn`, which decodes SEVERAL cohorts' prefill caches
        in one program (one ~6.5 GB/token decoder weight stream serves
        them all — decode device time is batch-independent, so G cohorts
        decode for the price of one)."""
        model = self.model
        text_model = self.text_model

        def fn(params, img_tokens, input_ids, pos_ids, prompt_len,
               prompt_seg):
            embeds = model.apply({"params": params}, input_ids, img_tokens,
                                 method=model.embed_multimodal)
            logits, _, caches = text_model.apply(
                {"params": params["language_model"]}, embeds, pos_ids,
                return_cache=True, segment_ids=prompt_seg,
                logits_indices=prompt_len - 1,
            )
            from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
                pad_caches,
            )

            T = input_ids.shape[1]
            caches = pad_caches(caches, T + max_new_tokens + n_q)
            first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return first, caches

        return jax.jit(fn)

    def _grouped_tail_fn(self, max_new_tokens: int, n_q: int):
        """Greedy decode + traj-latent chunk over a LIST of prefill cache
        trees (one per cohort) in one jitted program. Row-for-row
        bit-identical to `_fused_s2_fn`'s decode+latents on each cohort
        (tests/test_grouped_decode.py, tests/test_serving_shared_decode.py)."""
        model = self.model
        text_model = self.text_model
        eos = self.stop_token_ids

        from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
            greedy_decode_grouped,
        )

        def fn(params, trees, first_tok, rope_deltas, prompt_len):
            from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
                _entry_data,
            )

            group_sizes = [_entry_data(t[0][0]).shape[0] for t in trees]
            offs = np.cumsum([0] + group_sizes)
            tokens, lengths, trees2 = greedy_decode_grouped(
                text_model, params["language_model"], first_tok, trees,
                prompt_lengths=prompt_len, rope_deltas=rope_deltas,
                max_new_tokens=max_new_tokens, eos_token_ids=eos,
            )
            B = first_tok.shape[0]
            q_embeds = model.apply({"params": params},
                                   method=model.traj_queries)
            pos1 = (prompt_len + rope_deltas + lengths)[None, :, None] \
                + jnp.arange(n_q)[None, None, :]
            pos = jnp.broadcast_to(pos1, (3, B, n_q)).astype(jnp.int32)
            e = jnp.broadcast_to(
                q_embeds, (B, n_q, q_embeds.shape[-1])).astype(
                    text_model.cfg.dtype)
            cache_lens = [
                prompt_len[offs[g]:offs[g + 1]] + lengths[offs[g]:offs[g + 1]]
                for g in range(len(group_sizes))
            ]
            latents, _ = text_model.apply(
                {"params": params["language_model"]}, e, pos, trees2,
                cache_lens, method=text_model.decode_chunk_grouped,
            )
            return tokens, lengths, latents

        return jax.jit(fn)

    # ---------------------------------------------------------------- steps
    def s2_step(self, image: np.ndarray, instruction: str,
                look_down: bool = False, max_new_tokens: int = 128,
                fused: bool = True) -> S2Output:
        if not look_down:
            self.rgb_list.append(np.asarray(image))
            if self.episode_idx == 0:
                history_id = []
            else:
                history_id = np.unique(
                    np.linspace(0, self.episode_idx - 1, self.num_history, dtype=np.int32)
                ).tolist()
            frame_keys = sorted(int(i) for i in history_id) + [len(self.rgb_list) - 1]
            self.input_images = [self.rgb_list[i] for i in frame_keys]
            self._frame_keys = list(frame_keys)
            self.episode_idx += 1
        else:
            self.input_images = self.input_images + [np.asarray(image)]
            # look-down frames are transient: encode fresh, don't cache
            self._frame_keys = getattr(self, "_frame_keys", [None] * (
                len(self.input_images) - 1)) + [None]

        images = np.stack(self.input_images)
        hw = images.shape[1:3]
        input_ids = self._build_prompt_ids(instruction, len(images), hw)

        if fused:
            return self._s2_step_fused(images, input_ids, max_new_tokens,
                                       frame_keys=self._frame_keys)

        img_tokens, grid = self._encode_images(images)
        pos_ids, rope_deltas = get_rope_index_25(
            input_ids, grid,
            spatial_merge_size=self.cfg.vision.spatial_merge_size,
            image_token_id=self.cfg.image_token_index,
        )

        key = f"gen_{input_ids.shape}_{img_tokens.shape}_{max_new_tokens}"
        if key not in self._jit_cache:
            eos = self.stop_token_ids

            def gen_fn(params, input_ids, img_tokens, pos_ids, rope_deltas):
                embeds = self.model.apply(
                    {"params": params}, input_ids, img_tokens,
                    method=self.model.embed_multimodal,
                )
                return greedy_generate(
                    self.text_model, params["language_model"], embeds, pos_ids,
                    max_new_tokens=max_new_tokens, eos_token_ids=eos,
                    rope_deltas=rope_deltas,
                )

            self._jit_cache[key] = jax.jit(gen_fn)
        tokens, lengths = self._jit_cache[key](
            self.params, jnp.asarray(input_ids), img_tokens,
            jnp.asarray(pos_ids), jnp.asarray(rope_deltas[:, 0]),
        )
        gen = np.asarray(tokens)[0][: int(np.asarray(lengths)[0])]
        self.last_gen_tokens = gen
        self.llm_output = self.tokenizer.decode(gen)

        out = S2Output()
        if re.search(r"\d", self.llm_output):
            coords = [int(c) for c in re.findall(r"\d+", self.llm_output)]
            if len(coords) >= 2:
                out.output_pixel = np.array([coords[1], coords[0]])
            out.output_latent = self.generate_latents(input_ids, gen, img_tokens, grid)
        else:
            out.output_action = parse_actions(self.llm_output)
        return out

    #: prompt lengths are right-padded up to a multiple of this, so the
    #: fused S2 program compiles once per bucket instead of once per
    #: distinct instruction length (VERDICT r1 #6). 32 balances compile
    #: count against pad waste: pads are dead prefill FLOPs (the 9-image
    #: steady-state prompt is ~645 tokens — a 64-bucket padded it to 704,
    #: ~9% of the MXU-bound prefill; 32 pads to 672)
    PROMPT_BUCKET = 32

    def _gather_vision_tokens(self, images: np.ndarray,
                              frame_keys: Optional[List[Optional[int]]]):
        """Per-frame vision tokens with caching (history frames encode once
        per episode; misses run the single-image jitted encoder)."""
        if not self.cache_vision or frame_keys is None \
                or len(frame_keys) != len(images):
            toks, grid = self._encode_images(images)
            return toks, grid
        tokens = []
        single_grid = None
        for img, key in zip(images, frame_keys):
            tok = self._vision_cache.pop(key, None) if key is not None else None
            if tok is not None:
                self._vision_cache[key] = tok  # LRU touch
            else:
                tok, single_grid = self._encode_images(img[None])
                if key is not None:
                    self._vision_cache[key] = tok
                    # bounded: over a long episode every frame is "current"
                    # once; unbounded caching would hold O(episode_len)
                    # device tokens (~0.5 MB each at 7B dims)
                    while len(self._vision_cache) > 24:
                        self._vision_cache.pop(next(iter(self._vision_cache)))
            tokens.append(tok)
        img_tokens = jnp.concatenate(tokens, axis=0)
        if single_grid is None:  # all cache hits: derive the per-image grid
            h = images.shape[1] // self.cfg.vision.patch_size
            w = images.shape[2] // self.cfg.vision.patch_size
            single_grid = np.asarray([[1, h, w]])
        grid = np.tile(np.asarray(single_grid), (len(images), 1))
        return img_tokens, grid

    def _s2_step_fused(self, images: np.ndarray, input_ids: np.ndarray,
                       max_new_tokens: int,
                       frame_keys: Optional[List[Optional[int]]] = None
                       ) -> S2Output:
        cfg = self.cfg
        img_tokens, grid = self._gather_vision_tokens(images, frame_keys)
        # rope positions/deltas computed on the REAL prompt, then the prompt
        # is right-padded to a bucket with pads isolated by segment ids
        pos_ids, rope_deltas = get_rope_index_25(
            input_ids, grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_index,
        )
        B, P = input_ids.shape
        bucket = self.PROMPT_BUCKET
        T = -(-P // bucket) * bucket
        padded_ids = np.full((B, T), self.tokenizer.eos_token_id, np.int64)
        padded_ids[:, :P] = input_ids
        pos_ids = np.asarray(pos_ids)
        pad_pos = pos_ids.max() + 1 + np.arange(T - P)
        padded_pos = np.concatenate(
            [pos_ids, np.broadcast_to(pad_pos, (3, B, T - P))], axis=2)
        prompt_seg = np.zeros((B, T), np.int32)
        prompt_seg[:, P:] = 1
        prompt_len = np.full((B,), P, np.int32)
        key = f"fused_{padded_ids.shape}_{img_tokens.shape}_{max_new_tokens}"
        if key not in self._jit_cache:
            self._jit_cache[key] = self._fused_s2_fn(max_new_tokens, cfg.n_query)
        tokens, lengths, latents = self._jit_cache[key](
            self.params, img_tokens, jnp.asarray(padded_ids),
            jnp.asarray(padded_pos), jnp.asarray(rope_deltas[:, 0]),
            jnp.asarray(prompt_len), jnp.asarray(prompt_seg),
        )
        tokens_h, lengths_h, latents = jax.device_get(tokens), jax.device_get(lengths), latents
        gen = np.asarray(tokens_h)[0][: int(np.asarray(lengths_h)[0])]
        self.last_gen_tokens = gen
        self.llm_output = self.tokenizer.decode(gen)
        out = S2Output()
        if re.search(r"\d", self.llm_output):
            coords = [int(c) for c in re.findall(r"\d+", self.llm_output)]
            if len(coords) >= 2:
                out.output_pixel = np.array([coords[1], coords[0]])
            out.output_latent = latents
        else:
            out.output_action = parse_actions(self.llm_output)
        return out

    def generate_latents(self, input_ids: np.ndarray, generated: np.ndarray,
                         img_tokens, grid, bucket: int = 32) -> jnp.ndarray:
        """Extra prefill with appended traj-query tokens → last-layer hidden
        states of the query positions (reference internvla_n1.py:320-347).

        TPU note: the sequence is right-padded to a `bucket` multiple with
        the pad tokens placed in a separate attention segment, so the real
        tokens' hidden states are bit-identical to the unpadded prefill
        while the compiled shape stays fixed across decode lengths.
        """
        n_q = self.cfg.n_query
        real = np.concatenate([
            input_ids[0], np.asarray(generated, np.int64),
            np.full((n_q,), self.cfg.traj_token_index, np.int64),
        ])
        L = len(real)
        padded_len = -(-L // bucket) * bucket
        full = np.full((1, padded_len), self.tokenizer.eos_token_id, np.int64)
        full[0, :L] = real
        seg = np.zeros((1, padded_len), np.int32)
        seg[0, L:] = 1  # pads isolated in their own segment
        pos_ids, _ = get_rope_index_25(
            full, grid,
            spatial_merge_size=self.cfg.vision.spatial_merge_size,
            image_token_id=self.cfg.image_token_index,
        )

        def builder():
            def fn(params, full, seg, pos_ids, img_tokens, take):
                def inner(mdl):
                    e = mdl.embed_multimodal(full, img_tokens)
                    _, hidden, _ = mdl.prefill(e, pos_ids, segment_ids=seg)
                    return jax.lax.dynamic_slice_in_dim(hidden, take, n_q, axis=1)

                return self.model.apply({"params": params}, method=inner)

            return jax.jit(fn)

        key = f"latents_{padded_len}"
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        fn = self._jit_cache[key]
        return fn(self.params, jnp.asarray(full), jnp.asarray(seg),
                  jnp.asarray(pos_ids), img_tokens, jnp.asarray(L - n_q))

    def s1_step_latent(self, rgb: np.ndarray, depth: Optional[np.ndarray],
                       latent, continuous_traj: bool = True,
                       num_sample_trajs: int = 32) -> S1Output:
        """rgb: (B, 2, H, W, 3) [memory frame, current]; depth likewise
        (B, 2, H, W, 1); latent from generate_latents. Frames at any other
        camera resolution are host-resized to the pos-embed resolution
        (self.s1_image_hw), as the reference agent does
        (internvla_n1_agent.py:310-319)."""
        self._rng, sub = jax.random.split(self._rng)
        cfg = self.cfg
        if self.s1_image_hw:
            # resize only on a genuine patch-grid mismatch: the DinoViT
            # conv is SAME-padded stride 14, so any H with
            # ceil(H/14) == pos-embed grid feeds the loaded pos_embed
            # unchanged (tiny test policies built at e.g. 64 stay
            # bit-identical to the batched serving path)
            g0 = self.s1_image_hw // 14
            h, w = np.asarray(rgb).shape[-3:-1]
            if (-(-h // 14), -(-w // 14)) != (g0, g0):
                rgb = _resize_frames(rgb, self.s1_image_hw)
                if depth is not None:
                    depth = _resize_frames(depth, self.s1_image_hw)
        if "nextdit" in cfg.system1:
            rgb_u8 = np.asarray(rgb, np.uint8)
            key = f"s1_nextdit_{rgb_u8.shape}_{num_sample_trajs}"
            if key not in self._jit_cache:
                # normalize on-device: only uint8 pixels cross the link
                mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
                std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

                def fn(p, lat, raw, r):
                    im = (raw.astype(jnp.float32) / 255.0 - mean) / std
                    return self.model.apply(
                        {"params": p},
                        method=lambda mdl: mdl.generate_traj_nextdit(
                            lat, im, rng=r, num_sample_trajs=num_sample_trajs),
                    )

                self._jit_cache[key] = jax.jit(fn)
            dp_actions = self._jit_cache[key](
                self.params, latent, jnp.asarray(rgb_u8), sub)
        else:
            rgb_u8 = np.asarray(rgb, np.uint8)
            key = f"s1_navdp_{rgb_u8.shape}_{num_sample_trajs}"
            if key not in self._jit_cache:
                # /255 on-device: only uint8 pixels cross the link
                self._jit_cache[key] = jax.jit(
                    lambda p, lat, im, de, r: self.model.apply(
                        {"params": p},
                        method=lambda mdl: mdl.generate_traj_navdp(
                            lat, im.astype(jnp.float32) / 255.0, de,
                            rng=r, sample_num=num_sample_trajs),
                    )
                )
            dp_actions = self._jit_cache[key](
                self.params, latent, jnp.asarray(rgb_u8),
                jnp.asarray(depth, jnp.float32), sub)

        dp = np.asarray(dp_actions)
        if continuous_traj:
            action_list = traj_to_actions(dp)
        else:
            choice = int(np.asarray(jax.random.randint(sub, (), 0, dp.shape[0])))
            action_list = chunk_token(dp[choice])
        action_list = [a for a in action_list if a != 0]
        return S1Output(idx=action_list[:4], trajectory=dp)
