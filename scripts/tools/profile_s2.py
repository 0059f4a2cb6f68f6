"""Device-time profile of the fused System-2 / System-1 serving programs.

Runs the batched serving path at true 7B dims (int8-resident) on the real
TPU, captures a jax.profiler trace around one phase, and aggregates the
xplane "XLA Ops" line into a per-op-category device-time table — the tool
that found the fp32-rotary tax in round 2.

Usage:
    python scripts/tools/profile_s2.py [--phase s2|s1|decode] [--batch 16]
    python scripts/tools/profile_s2.py --layers 28 --top 40
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402

DECODE_TOKENS = 20
IMAGE_HW = 224
NUM_SAMPLE_TRAJS = 32


def parse_xplane(log_dir: str, top: int = 40) -> None:
    """Aggregate every device plane's 'XLA Ops' line by op name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    per_op: dict = defaultdict(float)
    per_cat: dict = defaultdict(float)
    total_ps = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps
                total_ps += dur
                per_op[name] += dur
                per_cat[_category(name)] += dur
    if total_ps == 0:
        print("no 'XLA Ops' events found (plane names:",
              [p.name for p in space.planes], ")")
        return

    print(f"\n== device time by category (total "
          f"{total_ps / 1e12 * 1e3:.2f} ms) ==")
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ps / 1e12 * 1e3:9.3f} ms  {100 * ps / total_ps:5.1f}%  {cat}")
    print(f"\n== top {top} ops ==")
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ps / 1e12 * 1e3:9.3f} ms  {100 * ps / total_ps:5.1f}%  "
              f"{name[:140]}")


def _category(name: str) -> str:
    n = name.lower()
    if "flash" in n or "attention" in n or "decode_attention" in n:
        return "attention-kernel"
    if re.search(r"convert|copy|transpose|bitcast", n) and "fusion" not in n:
        return "copy/convert/transpose"
    if "dot" in n or "conv" in n:
        return "matmul/conv"
    if "dynamic-update-slice" in n:
        return "cache-write"
    if "scatter" in n or "gather" in n:
        return "scatter/gather"
    if "fusion" in n:
        return "fusion"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="s2", choices=["s2", "s1", "cycle"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/s2_profile")
    ap.add_argument("--parse-only", action="store_true",
                    help="only re-parse an existing trace")
    args = ap.parse_args()

    if args.parse_only:
        parse_xplane(args.logdir, args.top)
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _full_n1_config, _random_bf16_params
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Model
    from internnav_tpu.model.basemodel.internvla_n1.serving import BatchedN1Policy

    cfg = _full_n1_config(args.layers, weight_dtype="int8")
    model = InternVLAN1Model(cfg)
    params = _random_bf16_params(model, cfg, IMAGE_HW)
    policy = BatchedN1Policy(model, params, cfg, batch_size=args.batch)
    policy.inner.tokenizer.eos_token_id = -7  # full decode budget

    instruction = ("walk down the hallway past the kitchen then turn left "
                   "and stop next to the round table")
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (IMAGE_HW, IMAGE_HW, 3)).astype(np.uint8)
    imgs = np.stack([img] * args.batch)

    policy.reset([instruction] * args.batch)
    for s in policy.slots:
        s.rgb_list = [img] * 8
        s.episode_idx = 8
        s.s1_mem_frame = jnp.asarray(img)

    def run_s2():
        outs = policy.s2_step(imgs, max_new_tokens=DECODE_TOKENS)
        return outs

    def latents_of(outs):
        return jnp.concatenate([
            o.output_latent if o.output_latent is not None
            else jnp.zeros((1, cfg.n_query, cfg.text.hidden_size), jnp.bfloat16)
            for o in outs], axis=0)

    print("warmup (compiles)...", flush=True)
    t0 = time.perf_counter()
    outs = run_s2()
    lat = latents_of(outs)
    policy.s1_step_latent(imgs, lat, num_sample_trajs=NUM_SAMPLE_TRAJS)
    policy.s1_step_latent(imgs, lat, num_sample_trajs=NUM_SAMPLE_TRAJS)
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    # timed (untraced) reference numbers
    for name, fn in [("s2", run_s2),
                     ("s1", lambda: policy.s1_step_latent(
                         imgs, lat, num_sample_trajs=NUM_SAMPLE_TRAJS))]:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best {best * 1e3:.1f} ms", flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    if args.phase == "s2":
        run_s2()
    elif args.phase == "s1":
        policy.s1_step_latent(imgs, lat, num_sample_trajs=NUM_SAMPLE_TRAJS)
    else:
        outs = run_s2()
        lat2 = latents_of(outs)
        policy.s1_step_latent(imgs, lat2, num_sample_trajs=NUM_SAMPLE_TRAJS)
        policy.s1_step_latent(imgs, lat2, num_sample_trajs=NUM_SAMPLE_TRAJS)
    jax.profiler.stop_trace()
    parse_xplane(args.logdir, args.top)


if __name__ == "__main__":
    main()
