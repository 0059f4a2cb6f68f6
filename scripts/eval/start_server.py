"""Agent-server launcher (reference scripts/eval/start_server.py:25-46)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from internnav_tpu.comm.server import AgentServer  # noqa: E402
from internnav_tpu.configs import load_py_config  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8023)
    ap.add_argument("--config", default=None, help="optional eval config; port read from agent cfg")
    args = ap.parse_args()
    host, port = args.host, args.port
    if args.config:
        cfg = load_py_config(args.config)
        host = cfg.agent.server_host or host
        port = cfg.agent.server_port or port
    AgentServer(host, port).run()


if __name__ == "__main__":
    main()
