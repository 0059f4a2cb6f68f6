"""W4 decode-projection micro-benchmark (real TPU).

Greedy decode of the 7B is HBM-bound: every token streams the decoder
weights once. int8 weight-only (current deployment format) reads 1 B/elem;
int4 would read 0.5 B/elem — IF the hardware/compiler streams the s4 array
at full rate and upcasts in VMEM without a materialized s8 copy.

This measures decode-shaped matvecs (M=16 rows) over N_BUF distinct
weight buffers (to defeat any caching) in four formats:
  bf16      — 2 B/elem reference
  s8        — current W8A8 path (int8 MXU dot)
  s4        — jnp.int4 array, dot after .astype(int8) (XLA-fused upcast?)
  s4packed  — two nibbles per int8 byte, unpacked in-graph then dot

Prints achieved GB/s of weight stream per format. Decision rule: if s4 (or
s4packed) sustains > ~1.5x the s8 GB-equivalent rate, W4 decode weights
are worth integrating.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--k", type=int, default=3584)
    ap.add_argument("--n", type=int, default=18944)
    ap.add_argument("--bufs", type=int, default=12)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    M, K, N, NB = args.m, args.k, args.n, args.bufs
    rs = np.random.RandomState(0)
    w8 = [jnp.asarray(rs.randint(-127, 128, (K, N)), jnp.int8) for _ in range(NB)]
    wbf = [w.astype(jnp.bfloat16) for w in w8]
    try:
        w4 = [jnp.asarray(np.asarray(rs.randint(-8, 8, (K, N)), np.int8)).astype(jnp.int4)
              for _ in range(NB)]
        have_int4 = True
    except Exception as e:
        print("int4 dtype unavailable:", e)
        have_int4 = False
    # packed: nibble pairs along K -> (K//2, N) int8
    wp = []
    for _ in range(NB):
        lo = rs.randint(0, 16, (K // 2, N)).astype(np.uint8)
        hi = rs.randint(0, 16, (K // 2, N)).astype(np.uint8)
        wp.append(jnp.asarray((hi << 4 | lo).view(np.int8)))

    xq = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)

    def run_bf16(x):
        acc = jnp.zeros((M, N), jnp.float32)
        for w in wbf:
            acc += jax.lax.dot(x.astype(jnp.bfloat16), w,
                               preferred_element_type=jnp.float32)
        return acc

    def run_s8(x):
        acc = jnp.zeros((M, N), jnp.int32)
        for w in w8:
            acc += jax.lax.dot(x, w, preferred_element_type=jnp.int32)
        return acc

    def run_s4(x):
        acc = jnp.zeros((M, N), jnp.int32)
        for w in w4:
            acc += jax.lax.dot(x, w.astype(jnp.int8),
                               preferred_element_type=jnp.int32)
        return acc

    def run_s4packed(x):
        acc = jnp.zeros((M, N), jnp.int32)
        for w in wp:
            u = w.view(jnp.uint8)
            lo = (u & 0xF).astype(jnp.int8) - 8
            hi = (u >> 4).astype(jnp.int8) - 8
            wk = jnp.stack([lo, hi], axis=1).reshape(K, N)
            acc += jax.lax.dot(x, wk, preferred_element_type=jnp.int32)
        return acc

    cases = [("bf16", run_bf16, 2.0), ("s8", run_s8, 1.0)]
    if have_int4:
        cases.append(("s4", run_s4, 0.5))
    cases.append(("s4packed", run_s4packed, 0.5))

    for name, fn, bpe in cases:
        try:
            f = jax.jit(fn)
            r = f(xq)
            np.asarray(r)  # force (block_until_ready unreliable on axon)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(f(xq))
                best = min(best, time.perf_counter() - t0)
            gb = NB * K * N * bpe / 1e9
            eq_gb = NB * K * N * 1.0 / 1e9  # s8-equivalent weight volume
            print(f"{name:9s}: {best * 1e3:7.2f} ms  stream {gb / best:7.1f} GB/s"
                  f"  (s8-equiv rate {eq_gb / best:7.1f} GB/s)")
        except Exception as e:
            print(f"{name:9s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
