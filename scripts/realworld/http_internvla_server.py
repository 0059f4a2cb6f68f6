"""Real-robot inference server launcher (reference
scripts/realworld/http_internvla_server.py).

Usage: python scripts/realworld/http_internvla_server.py --port 5801 \
          [--ckpt checkpoints/InternVLA-N1] [--system1 nextdit_async] \
          [--profile realtime|parity]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# Serving profiles for the one-robot HTTP server (VERDICT r4 #4: a
# nominated low-latency operating point, measured on-chip — see
# docs/benchmarks.md "Low-latency pareto"). The robot serves ONE stream,
# so the profile picks the per-step-latency config, not the multi-cohort
# throughput config:
#   realtime — W8A8 decoder projections + int8 KV cache: the lowest
#              measured per-action latency (the pareto's single-cohort
#              rows); recommended on a 16 GB v5e chip.
#   parity   — bf16 weights + bf16 KV: greedy decode bit-parity with the
#              torch reference (BASELINE.md north star), higher latency
#              (the 28-layer bf16 trunk does not fit resident; only for
#              reduced-depth or multi-chip deployments).
PROFILES = {
    "realtime": {"weight_dtype": "int8", "kv_dtype": "int8"},
    "parity": {"weight_dtype": "bf16", "kv_dtype": "bf16"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5801)
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--system1", default="nextdit_async")
    ap.add_argument("--profile", default="realtime", choices=sorted(PROFILES))
    args = ap.parse_args()

    from internnav_tpu.agent.internvla_n1_agent import InternVLAN1Agent
    from internnav_tpu.configs import AgentCfg
    from internnav_tpu.realworld.server import RealWorldServer

    agent = InternVLAN1Agent(AgentCfg(
        model_name="internvla_n1", ckpt_path=args.ckpt,
        model_settings={"system1": args.system1, "async_s2": True,
                        "continuous_traj": True, **PROFILES[args.profile]},
    ))
    RealWorldServer(agent, args.host, args.port).run()


if __name__ == "__main__":
    main()
