"""Real-robot inference server launcher (reference
scripts/realworld/http_internvla_server.py).

Usage: python scripts/realworld/http_internvla_server.py --port 5801 \
          [--ckpt checkpoints/InternVLA-N1] [--system1 nextdit_async]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5801)
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--system1", default="nextdit_async")
    args = ap.parse_args()

    from internnav_tpu.agent.internvla_n1_agent import InternVLAN1Agent
    from internnav_tpu.configs import AgentCfg
    from internnav_tpu.realworld.server import RealWorldServer

    agent = InternVLAN1Agent(AgentCfg(
        model_name="internvla_n1", ckpt_path=args.ckpt,
        model_settings={"system1": args.system1, "async_s2": True,
                        "continuous_traj": True},
    ))
    RealWorldServer(agent, args.host, args.port).run()


if __name__ == "__main__":
    main()
