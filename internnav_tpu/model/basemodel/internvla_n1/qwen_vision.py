"""Qwen2.5-VL vision tower (Flax) — windowed ViT + 2x2 patch merger.

Parity target: HF Qwen2_5_VisionTransformerPretrainedModel as used by the
reference System-2 (SURVEY.md §2.2): conv3d patch embed (temporal patch 2),
2-D rotary position embeddings per (h, w) patch coordinate, window
attention (window_size 112 → 8x8 merged-patch windows) with full attention
at fullatt_block_indexes, RMSNorm blocks with SwiGLU MLP, and the
spatial-merge MLP merger to the LLM width.

TPU-native split: all index bookkeeping (window permutation, cu_seqlens →
segment ids, rotary tables) is computed host-side per grid shape
(`VisionIndexCache` — grids are static per camera resolution so this runs
once), and the device graph is pure static-shape attention over segment
ids via the Pallas flash kernel path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.basemodel.internvla_n1.qwen_text import RMSNorm
from internnav_tpu.ops.flash_attention import flash_attention


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    out_hidden_size: int = 3584
    dtype: Any = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "QwenVisionConfig":
        return cls(depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
                   window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64)


# ------------------------------------------------------- host-side indexing
@functools.lru_cache(maxsize=32)
def vision_indices(cfg_key: Tuple, grid_thw_key: Tuple) -> Dict[str, np.ndarray]:
    """Window permutation + segment ids + rotary pos ids for a grid set.

    cfg_key = (patch_size, spatial_merge_size, window_size);
    grid_thw_key = tuple of (t, h, w) per image. All numpy; cached per
    shape (grids are static for a fixed camera).
    """
    patch_size, merge, window = cfg_key
    grid_thw = np.asarray(grid_thw_key)
    unit = merge * merge
    vit_ws = window // merge // patch_size

    window_index: List[np.ndarray] = []
    win_seqlens: List[int] = []
    pos_list: List[np.ndarray] = []
    idx_base = 0
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_ws
        pad_w = (-lw) % vit_ws
        nh, nw = (lh + pad_h) // vit_ws, (lw + pad_w) // vit_ws
        padded = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100)
        padded = padded.reshape(t, nh, vit_ws, nw, vit_ws).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nh * nw, vit_ws, vit_ws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        window_index.append(flat[flat != -100] + idx_base)
        win_seqlens.extend((seqlens * unit).tolist())
        idx_base += t * lh * lw

        # rotary (h, w) ids in merged-block order (HF rot_pos_emb)
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        pos_list.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))

    window_index = np.concatenate(window_index)
    pos_ids = np.concatenate(pos_list, axis=0)  # (S, 2)
    seq_len = pos_ids.shape[0]

    # full-attention segments: one segment per (frame, image)
    full_seqlens = np.repeat(grid_thw[:, 1] * grid_thw[:, 2], grid_thw[:, 0])
    full_seg = np.repeat(np.arange(len(full_seqlens)), full_seqlens)

    # window segments over the permuted order
    win_seg = np.repeat(np.arange(len(win_seqlens)), win_seqlens)

    # permute pos ids into window order at merge-unit granularity
    pos_units = pos_ids.reshape(seq_len // unit, unit, 2)[window_index].reshape(seq_len, 2)
    full_seg_units = full_seg.reshape(seq_len // unit, unit)[window_index].reshape(seq_len)

    reverse = np.argsort(window_index, kind="stable")
    # uniform-block fast path: when every window (resp. image) has the same
    # token count, block-diagonal attention is a reshape + batched attention
    # over tiny blocks instead of a segment-masked full-sequence kernel that
    # computes the whole S x S score matrix (28 windowed ViT blocks were
    # ~31 ms of the B=16 fused-S2 profile; true block-diagonal is ~256x
    # fewer FLOPs at the 224px 64-token window).
    window_block = int(win_seqlens[0]) if len(set(win_seqlens)) == 1 else 0
    full_lens = set(full_seqlens.tolist())
    full_block = int(full_seqlens[0]) if len(full_lens) == 1 else 0
    return {
        "window_index": window_index.astype(np.int32),
        "reverse_index": reverse.astype(np.int32),
        "pos_ids": pos_units.astype(np.int32),
        "window_segments": win_seg.astype(np.int32),
        "full_segments": full_seg_units.astype(np.int32),
        "seq_len": np.int32(seq_len),
        "window_block": window_block,
        "full_block": full_block,
    }


def rotary_table(pos_ids: np.ndarray, head_dim: int, theta: float = 10000.0):
    """(S, 2) h/w ids → cos/sin (S, head_dim) split half-h half-w
    (HF: rotary dim = head_dim // 2, half for h, half for w)."""
    dim_half = head_dim // 2
    inv = 1.0 / (theta ** (np.arange(0, dim_half, 2, dtype=np.float64) / dim_half))
    h_ang = pos_ids[:, 0:1] * inv[None]  # (S, dim_half/2)
    w_ang = pos_ids[:, 1:2] * inv[None]
    ang = np.concatenate([h_ang, w_ang], axis=-1)  # (S, dim_half)
    emb = np.concatenate([ang, ang], axis=-1)  # (S, head_dim)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


# ---------------------------------------------------------------- modules
class VisionBlock(nn.Module):
    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids, block: int = 0):
        """x: (S, D) token-major single sequence; segment_ids: (S,).

        block > 0: the segments are uniform contiguous `block`-token runs
        (vision_indices['window_block'/'full_block']) — attention runs
        block-diagonally via reshape + batched attention, skipping the
        off-diagonal work entirely."""
        c = self.cfg
        H = c.num_heads
        D = c.hidden_size // H
        xn = RMSNorm(1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c.hidden_size, use_bias=True, dtype=c.dtype, name="qkv")(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def rope(t):
            t = t.reshape(-1, H, D).astype(jnp.float32)
            cs, sn = cos[:, None], sin[:, None]
            half = D // 2
            rot = jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)
            return (t * cs + rot * sn)

        q = rope(q).astype(c.dtype)
        k = rope(k).astype(c.dtype)
        v = v.reshape(-1, H, D).astype(c.dtype)
        if block:
            S = q.shape[0]
            qb = q.reshape(S // block, block, H, D)
            kb = k.reshape(S // block, block, H, D)
            vb = v.reshape(S // block, block, H, D)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qb, kb,
                                preferred_element_type=jnp.float32)
            scores = scores / np.sqrt(D)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vb.dtype), vb,
                              preferred_element_type=jnp.float32)
            out = attn.astype(c.dtype).reshape(-1, c.hidden_size)
        else:
            # (1, H, S, D) with segment isolation; Pallas on TPU keeps memory
            # tile-bounded (the XLA path materializes (S, S) scores — 21 GB
            # at a 72-image batched-serving history warmup)
            attn = flash_attention(
                q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
                v.transpose(1, 0, 2)[None],
                causal=False, segment_ids=segment_ids[None],
            )
            out = attn[0].transpose(1, 0, 2).reshape(-1, c.hidden_size)
        out = nn.Dense(c.hidden_size, use_bias=True, dtype=c.dtype, name="proj")(out)
        x = x + out
        y = RMSNorm(1e-6, name="norm2")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=True, dtype=c.dtype, name="gate_proj")(y)
        up = nn.Dense(c.intermediate_size, use_bias=True, dtype=c.dtype, name="up_proj")(y)
        y = nn.Dense(c.hidden_size, use_bias=True, dtype=c.dtype, name="down_proj")(
            nn.silu(gate) * up
        )
        return x + y


class QwenVisionTower(nn.Module):
    """pixel patches (S, patch_dim) + host indices → merged tokens
    (S/merge_unit, out_hidden_size) in original order."""

    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, patches, cos, sin, window_segments, full_segments,
                 window_index, reverse_index, window_block: int = 0,
                 full_block: int = 0):
        c = self.cfg
        unit = c.spatial_merge_size ** 2
        x = nn.Dense(c.hidden_size, use_bias=False, dtype=c.dtype,
                     name="patch_embed")(patches.astype(c.dtype))
        S = x.shape[0]
        # permute into window order at merge-unit granularity
        x = x.reshape(S // unit, unit, -1)[window_index].reshape(S, -1)
        for i in range(c.depth):
            full = i in c.fullatt_block_indexes
            seg = full_segments if full else window_segments
            blk = full_block if full else window_block
            x = VisionBlock(c, name=f"blocks_{i}")(x, cos, sin, seg, block=blk)
        # merger: RMSNorm → group merge_unit → MLP
        x = RMSNorm(1e-6, name="merger_ln_q")(x)
        x = x.reshape(S // unit, unit * c.hidden_size)
        x = nn.Dense(unit * c.hidden_size, use_bias=True, dtype=c.dtype,
                     name="merger_fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(c.out_hidden_size, use_bias=True, dtype=c.dtype,
                     name="merger_fc2")(x)
        return x[reverse_index]


def preprocess_images(images: np.ndarray, cfg: QwenVisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: (N, H, W, 3) normalized images → (patches, grid_thw).

    Follows the Qwen processor patch layout: temporal patch 2 (images are
    repeated), channel-major flattening per patch.
    """
    n, H, W, _ = images.shape
    p, tp = cfg.patch_size, cfg.temporal_patch_size
    m = cfg.spatial_merge_size
    gh, gw = H // p, W // p
    patches_all = []
    grids = []
    for img in images:
        x = np.repeat(img[None], tp, axis=0)  # (tp, H, W, 3)
        x = x.transpose(0, 3, 1, 2)  # (tp, 3, H, W)
        x = x.reshape(tp, 3, gh // m, m, p, gw // m, m, p)
        x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)  # (gh/m, gw/m, m, m, 3, tp, p, p)
        patches = x.reshape(gh * gw, 3 * tp * p * p)
        patches_all.append(patches)
        grids.append((1, gh, gw))
    return np.concatenate(patches_all, axis=0), np.asarray(grids, np.int64)


def preprocess_images_device(images: jnp.ndarray, cfg: QwenVisionConfig,
                             mean, std) -> jnp.ndarray:
    """Device-side normalize + patchify: (N, H, W, 3) uint8 → patches
    (N*gh*gw, 3*tp*p*p) fp32. Same layout as `preprocess_images`, but run
    inside jit so only 1-byte pixels cross the host→device link (the fp32
    patch tensor is 4x larger and transfer-bound on networked TPUs)."""
    p, tp = cfg.patch_size, cfg.temporal_patch_size
    m = cfg.spatial_merge_size
    N, H, W, _ = images.shape
    gh, gw = H // p, W // p
    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    x = jnp.repeat(x[:, None], tp, axis=1)          # (N, tp, H, W, 3)
    x = x.transpose(0, 1, 4, 2, 3)                  # (N, tp, 3, H, W)
    x = x.reshape(N, tp, 3, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(N * gh * gw, 3 * tp * p * p)


def encode_images(
    tower: QwenVisionTower, params, images: np.ndarray,
    mean=(0.48145466, 0.4578275, 0.40821073),
    std=(0.26862954, 0.26130258, 0.27577711),
):
    """Full host+device image encode: returns (tokens (N_tok, out), grid_thw)."""
    cfg = tower.cfg
    imgs = (np.asarray(images, np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)
    patches, grid_thw = preprocess_images(imgs, cfg)
    idx = vision_indices(
        (cfg.patch_size, cfg.spatial_merge_size, cfg.window_size),
        tuple(map(tuple, grid_thw.tolist())),
    )
    head_dim = cfg.hidden_size // cfg.num_heads
    cos, sin = rotary_table(idx["pos_ids"], head_dim)
    tokens = tower.apply(
        {"params": params}, jnp.asarray(patches), jnp.asarray(cos), jnp.asarray(sin),
        jnp.asarray(idx["window_segments"]), jnp.asarray(idx["full_segments"]),
        jnp.asarray(idx["window_index"]), jnp.asarray(idx["reverse_index"]),
        window_block=idx["window_block"], full_block=idx["full_block"],
    )
    return tokens, grid_thw
