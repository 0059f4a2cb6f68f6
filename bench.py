"""Benchmark: InternVLA-N1 dual-system inference actions/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures one full dual-system macro-cycle on the TPU chip, matching the
reference's partial_async schedule (internvla_n1_agent.py:210-241):
  1 System-2 pass (multimodal prefill + 8-token greedy decode + latent
  prefill) + 2 System-1 NextDiT denoise calls (4 actions each)
  → 8 discrete actions per cycle.

Config note: this round runs a reduced-dimension N1 (same structure as the
7B: Qwen decoder + windowed ViT + NextDiT; smaller dims) until converted
7B weights land, so vs_baseline tracks framework/loop efficiency rather
than 7B FLOPs. REF_ACTIONS_PER_SEC=6.7 is the A100 estimate for the torch
reference's dual-system cycle (~1.1 s S2 generate + 2x ~0.05 s S1 denoise
for 8 actions); the reference publishes no per-step latency (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_ACTIONS_PER_SEC = 6.7
CYCLES = 5
DECODE_TOKENS = 8
ACTIONS_PER_CYCLE = 8


def main() -> None:
    import jax

    # persistent compile cache: repeat bench runs skip the long remote
    # compiles on the tunneled TPU
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _small_n1_config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

    cfg = _small_n1_config()
    policy = InternVLAN1Policy.build(cfg, image_hw=56)

    img = np.random.RandomState(0).randint(0, 255, (224, 224, 3)).astype(np.uint8)
    # history grows across steps; warm all used shapes first
    rgb2 = np.stack([img, img])[None]

    def s2():
        return policy.s2_step(img, "walk to the end of the corridor and stop",
                              max_new_tokens=DECODE_TOKENS)

    def s1(latent):
        return policy.s1_step_latent(rgb2, None, latent, num_sample_trajs=16)

    # warmup/compile (first s2 + s1 shapes)
    policy.reset()
    out = s2()
    latent = out.output_latent
    if latent is None:  # model emitted action text; use a zero latent for S1 timing
        latent = jnp.zeros((1, cfg.n_query, cfg.text.hidden_size))
    s1(latent)

    t0 = time.perf_counter()
    for _ in range(CYCLES):
        policy.reset()
        out = s2()
        lat = out.output_latent if out.output_latent is not None else latent
        s1(lat)
        s1(lat)
    dt = time.perf_counter() - t0

    actions_per_sec = CYCLES * ACTIONS_PER_CYCLE / dt
    print(json.dumps({
        "metric": "internvla_n1_dual_system_actions_per_sec_per_chip",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": round(actions_per_sec / REF_ACTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
