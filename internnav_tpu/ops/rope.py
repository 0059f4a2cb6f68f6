"""Rotary position embeddings: 1-D RoPE and Qwen2.5-VL multimodal M-RoPE.

The reference vendors Qwen's 3-D rotary index builders in
internnav/dataset/rope2d.py (get_rope_index_2:6, get_rope_index_25:183) and
relies on HF's Qwen2.5-VL attention for application. Here both the index
computation and the application are first-class jax ops; application uses
the half-rotation convention (rotate_half) matching HF Qwen2/LLaMA.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rope_inv_freq(dim: int, theta: float = 10000.0) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))


def rope_cos_sin(
    positions: jnp.ndarray, dim: int, theta: float = 10000.0, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (..., T) → cos/sin (..., T, dim) with freqs duplicated
    [f0..f_{d/2-1}, f0..f_{d/2-1}] (HF convention)."""
    inv = jnp.asarray(rope_inv_freq(dim, theta), dtype=jnp.float32)
    ang = positions[..., None].astype(jnp.float32) * inv  # (..., T, dim/2)
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q/k: (B, H, T, D); cos/sin: (B, T, D) or (T, D)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, None], sin[:, None]  # (B, 1, T, D)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def mrope_cos_sin(
    position_ids: jnp.ndarray,
    dim: int,
    mrope_section: Sequence[int],
    theta: float = 1000000.0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal RoPE (Qwen2.5-VL).

    position_ids: (3, B, T) — temporal/height/width position streams.
    mrope_section: e.g. (16, 24, 24) halves of the head dim assigned to
    (t, h, w); the cos/sin for each frequency band are taken from the
    corresponding stream, then duplicated to full dim.
    """
    inv = jnp.asarray(rope_inv_freq(dim, theta), dtype=jnp.float32)  # (dim/2,)
    sections = list(mrope_section)
    assert sum(sections) == dim // 2, (sections, dim)
    # static per-section slices: frequency band [start, start+sec) reads its
    # stream's positions directly. (A take_along_axis formulation computed
    # cos/sin for all 3 streams then gathered — the two gather fusions were
    # 22 ms of the B=16 fused-S2 device profile, ~20x the cost of this.)
    parts_c, parts_s = [], []
    start = 0
    for stream, sec in enumerate(sections):
        ang = (position_ids[stream][..., None].astype(jnp.float32)
               * inv[start : start + sec])  # (B, T, sec)
        parts_c.append(jnp.cos(ang))
        parts_s.append(jnp.sin(ang))
        start += sec
    cos_half = jnp.concatenate(parts_c, axis=-1)  # (B, T, dim/2)
    sin_half = jnp.concatenate(parts_s, axis=-1)
    cos = jnp.concatenate([cos_half, cos_half], axis=-1)
    sin = jnp.concatenate([sin_half, sin_half], axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def get_rope_index_25(
    input_ids: np.ndarray,
    image_grid_thw: Optional[np.ndarray],
    video_grid_thw: Optional[np.ndarray] = None,
    *,
    spatial_merge_size: int = 2,
    image_token_id: int = 151655,
    video_token_id: int = 151656,
    vision_start_token_id: int = 151652,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    tokens_per_second: float = 2.0,
    attention_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """3-D rotary position indices for Qwen2.5-VL (reference rope2d.py:183).

    Host-side (numpy) computation — runs in the data pipeline, not under jit.
    input_ids: (B, T). Returns (position_ids (3, B, T), rope_deltas (B, 1)).

    Text tokens advance all three streams together; each image/video patch
    grid gets temporal/row/col indices offset to start after the preceding
    text, and the following text resumes at max(position)+1.
    """
    input_ids = np.asarray(input_ids)
    B, T = input_ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    position_ids = np.ones((3, B, T), dtype=np.int64)
    rope_deltas = np.zeros((B, 1), dtype=np.int64)
    img_ptr = 0
    vid_ptr = 0
    for b in range(B):
        ids = input_ids[b][attention_mask[b] == 1]
        pos_list: List[np.ndarray] = []
        st = 0
        current_max = -1

        def emit_text(n):
            nonlocal current_max
            if n <= 0:
                return
            base = current_max + 1
            p = np.arange(n) + base
            pos_list.append(np.tile(p, (3, 1)))
            current_max = int(p[-1])

        i = 0
        n = len(ids)
        while i < n:
            tok = ids[i]
            if tok == image_token_id or tok == video_token_id:
                if tok == image_token_id:
                    t_g, h_g, w_g = (int(x) for x in image_grid_thw[img_ptr])
                    t_scale = 0.0
                    img_ptr_inc = True
                else:
                    t_g, h_g, w_g = (int(x) for x in video_grid_thw[vid_ptr])
                    spg = second_per_grid_ts[vid_ptr] if second_per_grid_ts else 1.0
                    t_scale = float(spg) * tokens_per_second
                    img_ptr_inc = False
                h = h_g // spatial_merge_size
                w = w_g // spatial_merge_size
                ntok = t_g * h * w
                base = current_max + 1
                t_idx = (np.arange(t_g).reshape(t_g, 1).repeat(h * w, 1)).reshape(-1)
                if t_scale > 0:
                    t_idx = (t_idx * t_scale).astype(np.int64)
                h_idx = np.tile(np.arange(h).reshape(1, h, 1).repeat(w, 2).reshape(1, -1), (t_g, 1)).reshape(-1)
                w_idx = np.tile(np.arange(w).reshape(1, 1, w).repeat(h, 1).reshape(1, -1), (t_g, 1)).reshape(-1)
                pos = np.stack([t_idx, h_idx, w_idx]) + base
                pos_list.append(pos)
                current_max = int(pos.max())
                if img_ptr_inc:
                    img_ptr += 1
                else:
                    vid_ptr += 1
                i += ntok
            else:
                # run of text tokens
                j = i
                while j < n and ids[j] != image_token_id and ids[j] != video_token_id:
                    j += 1
                emit_text(j - i)
                i = j
        if pos_list:
            full = np.concatenate(pos_list, axis=1)
        else:
            full = np.zeros((3, 0), dtype=np.int64)
        position_ids[:, b, attention_mask[b] == 1] = full[:, :n]
        rope_deltas[b, 0] = (full.max() + 1 if full.size else 0) - n
    return position_ids, rope_deltas


def get_rope_index_2(
    input_ids: np.ndarray,
    image_grid_thw: Optional[np.ndarray],
    video_grid_thw: Optional[np.ndarray] = None,
    *,
    spatial_merge_size: int = 2,
    image_token_id: int = 151655,
    video_token_id: int = 151656,
    vision_start_token_id: int = 151652,
    attention_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Qwen2-VL 3-D rotary indices (reference rope2d.py:183 —
    `get_rope_index_2`, selected by the trainer's Qwen2-VL model path,
    internvla_n1_trainer.py:150).

    Identical position walk to `get_rope_index_25` except video temporal
    indices advance one per temporal grid — Qwen2-VL has no
    second_per_grid_ts * tokens_per_second scaling."""
    return get_rope_index_25(
        input_ids, image_grid_thw, video_grid_thw,
        spatial_merge_size=spatial_merge_size,
        image_token_id=image_token_id, video_token_id=video_token_id,
        vision_start_token_id=vision_start_token_id,
        second_per_grid_ts=None, tokens_per_second=1.0,
        attention_mask=attention_mask,
    )
