"""Flash-attention kernel micro-benchmark (real TPU).

Times the Pallas forward and the tiled dq/dkv backward at the reference's
training shape (seq 8192 packed, 7B head geometry: 28 heads x 128) and
prints achieved TFLOP/s. Run:

    python scripts/tools/bench_flash_attention.py [--seq 8192] [--heads 28]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=28)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from internnav_tpu.ops.flash_attention import (
        flash_attention,
        segment_ids_from_cu_seqlens,
    )

    B, H, T, D = args.batch, args.heads, args.seq, args.head_dim
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rs.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rs.standard_normal((B, H, T, D)), jnp.bfloat16)
    cu = jnp.asarray([0, T // 3, T // 2, T])
    seg = jnp.broadcast_to(segment_ids_from_cu_seqlens(cu, T)[None], (B, T))

    # chain iterations inside ONE jit so per-dispatch (tunnel) overhead
    # amortizes away; the data dependency via q prevents dead-code removal
    REPS = 8

    @jax.jit
    def fwd(q, k, v):
        def body(qc, _):
            o = flash_attention(qc, k, v, causal=True, segment_ids=seg)
            return o.astype(qc.dtype), ()
        qf, _ = jax.lax.scan(body, q, None, length=REPS)
        return jnp.float32(jnp.sum(qf.astype(jnp.float32)))

    def loss(q, k, v):
        o = flash_attention(q, k, v, causal=True, segment_ids=seg)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def bwd(q, k, v):
        def body(qc, _):
            dq, dk, dv = grad(qc, k, v)
            return (qc + dq.astype(qc.dtype) * 0).astype(qc.dtype) + \
                dq.astype(qc.dtype) * 1e-9, ()
        qf, _ = jax.lax.scan(body, q, None, length=REPS)
        return jnp.float32(jnp.sum(qf.astype(jnp.float32)))

    def clock(fn):
        float(fn(q, k, v))  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fn(q, k, v))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / REPS

    t_fwd = clock(fwd)
    t_bwd = clock(bwd)
    # causal attention FLOPs: ~2 matmuls fwd, ~5 bwd, halved by causality
    flops_fwd = 2 * 2 * B * H * T * T * D * 0.5
    flops_bwd = 5 * 2 * B * H * T * T * D * 0.5
    print(f"fwd  {t_fwd * 1e3:8.2f} ms   {flops_fwd / t_fwd / 1e12:6.1f} TFLOP/s")
    print(f"bwd  {t_bwd * 1e3:8.2f} ms   {flops_bwd / t_bwd / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
