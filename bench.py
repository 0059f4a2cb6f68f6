"""Benchmark: policy actions/sec/chip on the current flagship model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Flagship today: CMA inference (batched recurrent eval forward, the VLN-PE
hot path). vs_baseline compares against REF_ACTIONS_PER_SEC — the torch
reference's estimated per-GPU policy rate for the same model family. The
reference publishes no per-step latency (BASELINE.md "not published"); the
estimate of 30 policy steps/s/GPU comes from the reference's own eval
throughput accounting (full VLN-PE bench 1.6 h on 16 GPUs for ~3k episodes
× ~60 macro-steps, simulator-inclusive), so treat vs_baseline as
provisional until the InternVLA-N1 path lands.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_ACTIONS_PER_SEC = 30.0  # provisional torch-GPU estimate (see docstring)
BATCH = 8
STEPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from internnav_tpu.model import get_config, get_policy

    cfg = get_config("cma")
    policy = get_policy("cma").build(cfg)

    @jax.jit
    def forward(params, obs, states, prev_actions, masks):
        logits, states, _ = policy.module.apply({"params": params}, obs, states,
                                                prev_actions, masks)
        return jnp.argmax(logits, axis=-1), states

    rs = np.random.RandomState(0)
    obs = {
        "instruction": jnp.asarray(rs.randint(1, 100, (BATCH, 80)), jnp.int32),
        "rgb": jnp.asarray(rs.randint(0, 255, (BATCH, 224, 224, 3)).astype(np.float32)),
        "depth": jnp.asarray(rs.rand(BATCH, 256, 256, 1).astype(np.float32)),
    }
    states = jnp.zeros((BATCH, 2, cfg.state_encoder.hidden_size))
    prev = jnp.zeros((BATCH,), jnp.int32)
    masks = jnp.ones((BATCH,))

    # warmup/compile
    actions, states_w = forward(policy.params, obs, states, prev, masks)
    jax.block_until_ready(actions)

    t0 = time.perf_counter()
    st = states
    for _ in range(STEPS):
        actions, st = forward(policy.params, obs, st, prev, masks)
    jax.block_until_ready(actions)
    dt = time.perf_counter() - t0

    actions_per_sec = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "cma_policy_actions_per_sec_per_chip",
        "value": round(actions_per_sec, 2),
        "unit": "actions/s",
        "vs_baseline": round(actions_per_sec / REF_ACTIONS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
