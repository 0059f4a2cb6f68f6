"""Flash attention for TPU (Pallas) with causal + segment-id masking.

Replaces the reference's flash-attn CUDA dependency (reference
requirements/internvla_n1.txt; used at internvla_n1_policy.py:37 and by the
sequence-packing patch in trainer/qwenvl_base.py:18-104). The segment-id
variant is the TPU equivalent of `flash_attn_varlen_func` + `cu_seqlens`
packing: packed samples carry an integer segment id per token and attention
is confined within equal segments.

Layout: q, k, v are (B, H, T, D). Stats are kept in fp32; the score matrix
is never materialized beyond one (block_q, block_k) tile (online softmax).

`flash_attention` is differentiable: the forward kernel also emits the
per-row logsumexp, and the backward runs two tiled Pallas kernels (a dK/dV
kernel accumulating over query blocks and a dQ kernel accumulating over KV
blocks) so the (Tq, Tk) score matrix is never materialized in either
direction — memory stays O(block_q * block_k) per core at the reference
training length of 8192 (train_dual_system.sh:80).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


# ----------------------------------------------------------------- reference
def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    kv_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain-XLA attention, ground truth for the Pallas kernel.

    q: (B, H, Tq, D); k/v: (B, H, Tk, D); segment_ids: (B, Tq) int32;
    kv_segment_ids defaults to segment_ids (self-attention).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * sm_scale
    Tq, Tk = q.shape[2], k.shape[2]
    mask = jnp.ones((q.shape[0], 1, Tq, Tk), dtype=bool)
    if causal:
        offset = Tk - Tq  # queries are the last Tq positions of the kv stream
        cm = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=offset)
        mask = mask & cm[None, None]
    if segment_ids is not None:
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        sm = segment_ids[:, :, None] == kv_seg[:, None, :]
        mask = mask & sm[:, None]
    if kv_len is not None:
        lm = jnp.arange(Tk)[None, :] < jnp.asarray(kv_len).reshape(-1, 1)
        mask = mask & lm[:, None, None, :]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    # rows with no valid key (padding query rows) produce ~uniform garbage;
    # zero them so packed-padding rows contribute nothing downstream.
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


# -------------------------------------------------------------------- kernel
def _flash_kernel(
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    kv_blocks: int, use_segments: bool,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # whole-block causal skip: run only if some (row, col) with col <= row
    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, D) — native dtype: bf16 dots run at
        k = k_ref[0, 0]  # the full MXU rate (fp32 operands would be 4-8x slower)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k) fp32
        s = s * sm_scale

        mask = None
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            mask = col <= row
        if use_segments:
            qs = qseg_ref[0, 0]  # (block_q,)
            ks = kseg_ref[0, 0]  # (block_k,)
            seg = qs[:, None] == ks[None, :]
            mask = seg if mask is None else (mask & seg)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]  # (block_q, NUM_LANES) broadcast stats
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast over lanes
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        if mask is not None:
            # exp(MASK - max) can be nonzero garbage when a whole row is
            # masked (max == MASK_VALUE); force masked entries to zero.
            p = jnp.where(mask, p, 0.0)
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        l_next_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        acc_scratch[...] *= (l_corr * l_next_inv)[:, :1]
        v = v_ref[0, 0]
        # fp32 softmax weights round to the value dtype for the second dot
        # (the standard flash-attention recipe; lossless for fp32 inputs)
        o_curr = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        acc_scratch[...] += o_curr * l_next_inv[:, :1]

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        o_ref[0, 0] = acc_scratch[...].astype(o_ref.dtype)
        # per-row logsumexp for the backward kernels; fully-masked rows
        # (l == 0) get -inf, which the backward treats as "no valid key"
        m = m_scratch[...][:, :1]
        l = l_scratch[...][:, :1]
        lse = jnp.where(l > 0.0, m + jnp.log(l), -jnp.inf)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_forward(
    q, k, v, q_segment_ids, kv_segment_ids,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    if Tq % block_q or Tk % block_k:
        raise ValueError(f"sequence lengths ({Tq},{Tk}) must divide blocks ({block_q},{block_k})")
    use_segments = q_segment_ids is not None
    grid = (B, H, Tq // block_q, Tk // block_k)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki: (b, h, ki, 0)),
    ]
    args = [q, k, v]
    if use_segments:
        # (B, 1, T) layout: a (1, 1, block) block's last-two dims are
        # (1, block), which satisfies the TPU (8, 128) tiling rule for any
        # batch size — (B, T) with (1, block) blocks only lowers when B == 1
        in_specs.append(pl.BlockSpec((1, 1, block_q),
                                     lambda b, h, qi, ki: (b, 0, qi)))
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, h, qi, ki: (b, 0, ki)))
        args += [q_segment_ids.astype(jnp.int32)[:, None],
                 kv_segment_ids.astype(jnp.int32)[:, None]]
    else:
        # dummy scalars so the kernel signature is stable
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args += [jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)]

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        kv_blocks=Tk // block_k,
        use_segments=use_segments,
    )
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            # lanes-padded per-row logsumexp (layout matches the official
            # pallas flash-attention residuals); sliced to (B,H,Tq) by users
            jax.ShapeDtypeStruct((B, H, Tq, NUM_LANES), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, qi, ki: (b, h, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(*args)
    return o, lse


# ----------------------------------------------------------------- backward
def _recompute_p_ds(q, k, lse, di, qseg_ref, kseg_ref, q_off, k_off,
                    *, causal, sm_scale, use_segments):
    """Shared tile math for both backward kernels.

    q (block_q, D), k (block_k, D), lse/di (block_q, 1) fp32. Returns
    (p, ds) both (block_q, block_k) fp32, with masked entries zeroed.
    ds already includes the sm_scale factor (dS = P*(dP - D) * scale).
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    mask = None  # (native-dtype operands: bf16 dots at full MXU rate)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_off
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + k_off
        mask = col <= row
    if use_segments:
        qs = qseg_ref[0, 0]
        ks = kseg_ref[0, 0]
        seg = qs[:, None] == ks[None, :]
        mask = seg if mask is None else (mask & seg)
    # rows with no valid key have lse == -inf; exp(s - (-inf)) would be inf,
    # so substitute 0 for those rows (their output was 0, gradient is 0)
    lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
    p = jnp.exp(s - lse_safe)
    p = jnp.where(jnp.isfinite(lse), p, 0.0)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    return p, mask


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, di_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, causal, sm_scale, block_q, block_k, q_blocks, use_segments,
):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    if causal:
        # this (q, kv) tile holds a valid (row >= col) pair?
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]      # (block_q, D) native dtype
        k = k_ref[0, 0]      # (block_k, D)
        v = v_ref[0, 0]
        do = do_ref[0, 0]    # (block_q, D)
        lse = lse_ref[0, 0][:, :1]               # (block_q, 1)
        di = di_ref[0, 0][:, :1]
        p, _ = _recompute_p_ds(
            q, k, lse, di, qseg_ref, kseg_ref,
            q_idx * block_q, kv_idx * block_k,
            causal=causal, sm_scale=sm_scale, use_segments=use_segments,
        )
        # dV += P^T dO (fp32 p rounds to the operand dtype for the dot)
        dv_scratch[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (dP - D) * scale ; dK += dS^T Q
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di) * sm_scale
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, do_ref, lse_ref, di_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    dq_ref,
    dq_scratch,
    *, causal, sm_scale, block_q, block_k, kv_blocks, use_segments,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    if causal:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]
        p, _ = _recompute_p_ds(
            q, k, lse, di, qseg_ref, kseg_ref,
            q_idx * block_q, kv_idx * block_k,
            causal=causal, sm_scale=sm_scale, use_segments=use_segments,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di) * sm_scale
        # dQ += dS K (fp32 ds rounds to the operand dtype for the dot)
        dq_scratch[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                       preferred_element_type=jnp.float32)

    @pl.when(kv_idx == kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_backward(q, k, v, q_segment_ids, kv_segment_ids, o, lse, do,
                    *, causal, sm_scale, block_q, block_k):
    """Tiled dq/dk/dv: never materializes the (Tq, Tk) score matrix."""
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    use_segments = q_segment_ids is not None

    # D_i = rowsum(dO * O): one cheap bandwidth-bound XLA pass
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, H, Tq, NUM_LANES))

    def seg_specs(q_map, k_map):
        if use_segments:
            # (B, 1, T) layout — see _flash_forward for the tiling rationale
            def lift(m):
                return lambda b, h, i, j: (m(b, h, i, j)[0], 0, m(b, h, i, j)[1])

            return (
                [pl.BlockSpec((1, 1, block_q), lift(q_map)),
                 pl.BlockSpec((1, 1, block_k), lift(k_map))],
                [q_segment_ids.astype(jnp.int32)[:, None],
                 kv_segment_ids.astype(jnp.int32)[:, None]],
            )
        return (
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM)],
            [jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)],
        )

    # ---- dK/dV: grid (B, H, kv_blocks, q_blocks), q is the reduce axis
    sspecs, sargs = seg_specs(lambda b, h, i, j: (b, j), lambda b, h, i, j: (b, i))
    qspec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, j, 0))
    statspec = pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, j, 0))
    kspec = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k, q_blocks=Tq // block_q,
            use_segments=use_segments,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(B, H, Tk // block_k, Tq // block_q),
        in_specs=[qspec, qspec, statspec, statspec, kspec, kspec] + sspecs,
        out_specs=(kspec, kspec),
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, do, lse, di, k, v, *sargs)

    # ---- dQ: grid (B, H, q_blocks, kv_blocks), kv is the reduce axis
    sspecs, sargs = seg_specs(lambda b, h, i, j: (b, i), lambda b, h, i, j: (b, j))
    qspec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0))
    statspec = pl.BlockSpec((1, 1, block_q, NUM_LANES), lambda b, h, i, j: (b, h, i, 0))
    kspec = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0))
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k, kv_blocks=Tk // block_k,
            use_segments=use_segments,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, H, Tq // block_q, Tk // block_k),
        in_specs=[qspec, qspec, statspec, statspec, kspec, kspec] + sspecs,
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, do, lse, di, k, v, *sargs)
    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash_attention(q, k, v, q_segment_ids, kv_segment_ids,
                     causal, sm_scale, block_q, block_k):
    o, _ = _flash_forward(
        q, k, v, q_segment_ids, kv_segment_ids,
        causal=causal, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
    )
    return o


def _flash_fwd(q, k, v, qs, ks, causal, sm_scale, block_q, block_k):
    o, lse = _flash_forward(
        q, k, v, qs, ks,
        causal=causal, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
    )
    return o, (q, k, v, qs, ks, o, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, res, g):
    q, k, v, qs, ks, o, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, qs, ks, o, lse, g,
        causal=causal, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
    )
    return dq, dk, dv, None, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention. (B, H, T, D) in, (B, H, Tq, D) out.

    On TPU this runs the Pallas online-softmax kernel; on CPU (tests) it
    falls back to the XLA reference, which computes the identical function.

    Default blocks are 1024x1024: the kernel is per-tile-overhead-bound at
    small tiles (measured on v5e: 128-blocks run at ~16% of the chip's
    matmul rate, 1024-blocks at ~92%). When the sequence length doesn't
    divide the preferred block, the largest power-of-two divisor >= 64 is
    used; truly odd shapes fall back to the XLA path.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if segment_ids is not None and kv_segment_ids is None:
        kv_segment_ids = segment_ids

    def pick_block(T: int, pref: int) -> int:
        b = min(pref, T)
        while b >= 64 and T % b:
            b //= 2
        return b

    Tq, Tk = q.shape[2], k.shape[2]
    bq, bk = pick_block(Tq, block_q), pick_block(Tk, block_k)
    if bq < 64 or bk < 64 or Tq % bq or Tk % bk:
        use_pallas = False
    if not use_pallas:
        return mha_reference(
            q, k, v, causal=causal, segment_ids=segment_ids,
            kv_segment_ids=kv_segment_ids, sm_scale=sm_scale,
        )
    return _flash_attention(
        q, k, v, segment_ids, kv_segment_ids, causal, sm_scale, bq, bk
    )


# ------------------------------------------------------------------- decode
def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-token decode attention over a (B, H, Tmax, D) KV cache.

    Bandwidth-bound; XLA emits a near-roofline fused kernel for this shape,
    so no Pallas needed. cache_len: (B,) valid lengths (the new token's slot
    is already written at cache_len-1).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), k_cache.astype(jnp.float32))
    s = s * sm_scale
    Tmax = k_cache.shape[2]
    mask = jnp.arange(Tmax)[None, :] < cache_len.reshape(-1, 1)
    s = jnp.where(mask[:, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p, v_cache.astype(jnp.float32)).astype(q.dtype)


def gqa_decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Grouped-query decode without materializing the KV head repeat.

    q: (B, H, D) with H = KV * G; caches: (B, KV, Tmax, D). HBM traffic on
    the cache (the decode bottleneck at 7B: H/KV = 7x) reads each KV head
    once, with the G query heads of a group batched into one matmul.

    int8 KV: pass int8 caches with k_scale/v_scale (B, KV, Tmax) symmetric
    per-token-per-head dequant scales. Because the scale is constant along
    D, k dequant commutes with the q·k dot (logits *= k_scale) and v
    dequant commutes with the probability sum (p *= v_scale) — the int8
    cache streams from HBM at one byte/element with no bf16 copy ever
    materialized.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    B, H, D = q.shape
    KV, Tmax = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    qg = q.reshape(B, KV, G, D).astype(jnp.float32)
    s = jnp.einsum("bkgd,bktd->bkgt", qg, k_cache.astype(jnp.float32)) * sm_scale
    if k_scale is not None:
        s = s * k_scale[:, :, None, :]
    mask = jnp.arange(Tmax)[None, :] < cache_len.reshape(-1, 1)
    s = jnp.where(mask[:, None, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, :]
    out = jnp.einsum("bkgt,bktd->bkgd", p, v_cache.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


def gqa_chunk_decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decode attention for a CHUNK of n new tokens in one cache pass.

    q: (B, H, n, D); caches: (B, KV, Tmax, D) with the chunk's K/V already
    written at positions cache_len..cache_len+n-1. Query i attends to cache
    positions < cache_len + i + 1 (stepwise-causal), so the result is
    bit-comparable to n sequential `gqa_decode_attention` steps — but the
    KV cache streams from HBM once instead of n times. Used for the n_query
    traj-latent queries whose inputs are fixed embeddings (no sequential
    data dependence), replacing n full decoder weight reads with one.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    B, H, n, D = q.shape
    KV, Tmax = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    qg = q.reshape(B, KV, G, n, D).astype(jnp.float32)
    s = jnp.einsum("bkgnd,bktd->bkgnt", qg,
                   k_cache.astype(jnp.float32)) * sm_scale
    if k_scale is not None:  # int8 KV (see gqa_decode_attention)
        s = s * k_scale[:, :, None, None, :]
    limit = cache_len.reshape(-1, 1) + 1 + jnp.arange(n)[None]  # (B, n)
    mask = jnp.arange(Tmax)[None, None, :] < limit[:, :, None]  # (B, n, Tmax)
    s = jnp.where(mask[:, None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, None, :]
    out = jnp.einsum("bkgnt,bktd->bkgnd", p, v_cache.astype(jnp.float32))
    return out.reshape(B, H, n, D).astype(q.dtype)


def segment_ids_from_cu_seqlens(cu_seqlens, total_len: int) -> jnp.ndarray:
    """cu_seqlens (reference packing format, qwenvl_base.py:85-97) → per-token
    segment ids of shape (total_len,). cu_seqlens = [0, l0, l0+l1, ...]."""
    positions = jnp.arange(total_len)
    # segment id = number of boundaries <= position
    return jnp.sum(positions[:, None] >= cu_seqlens[None, 1:-1], axis=-1).astype(jnp.int32)
