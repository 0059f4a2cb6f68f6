"""IROS onsite-competition driver (reference scripts/iros_challenge/
onsite_competition/sdk/main.py): interactive confirm loop — pick an
instruction, query the agent server per step, confirm each discrete action
before executing it on the real robot, MJPEG preview stream on the side."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from internnav_tpu.comm.client import AgentClient  # noqa: E402
from internnav_tpu.configs import load_py_config  # noqa: E402
from internnav_tpu.configs.evaluator import EnvCfg  # noqa: E402
from internnav_tpu.env.base import Env  # noqa: E402

ACTION_WORDS = ["stand still", "move forward", "turn left", "turn right"]


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="eval config file exposing eval_cfg")
    ap.add_argument("--instructions", default="scripts/iros_challenge/instructions.json")
    ap.add_argument("--instruction", default=None, help="override instruction text")
    ap.add_argument("--uninteractive_mode", action="store_true",
                    help="skip per-step confirmation")
    ap.add_argument("--stream_port", type=int, default=0,
                    help="MJPEG preview port (0 = off)")
    return ap.parse_args()


def confirm(msg: str) -> bool:
    try:
        answer = input(f"{msg} [y/N]: ").strip().lower()
    except (EOFError, KeyboardInterrupt):
        print("\nCancelled.")
        return False
    return answer in ("", "y")


def pick_instruction(path: str) -> str:
    items = json.load(open(path))
    print("Available instructions:")
    for i, item in enumerate(items):
        print(f"{i}: {item.get('instruction_title', item)}")
    idx = int(input("input instruction id: ").strip())
    ins = items[idx]["instruction"]
    return ins[0] if isinstance(ins, list) else ins


def main() -> None:
    args = parse_args()
    cfg = load_py_config(args.config, attr="eval_cfg")
    agent = AgentClient(cfg.agent)

    env = Env.init(EnvCfg(env_type="realworld",
                          env_settings=cfg.env.env_settings), cfg.task)
    stream = None
    if args.stream_port:
        from stream import PreviewStream

        stream = PreviewStream(env, port=args.stream_port)
        stream.start()

    while True:
        instruction = args.instruction or pick_instruction(args.instructions)
        print("\nNew instruction:", instruction)
        if stream:
            stream.set_instruction(instruction)
        while True:
            obs = env.get_observation()
            obs = dict(obs[0] if isinstance(obs, list) else obs)
            obs["instruction_text"] = instruction
            action = agent.step([obs])[0]["action"][0]
            word = ACTION_WORDS[max(0, min(3, int(action)))]
            if args.uninteractive_mode or confirm(f"Execute [{word}]?"):
                env.step([action])
            else:
                print("Stop requested; resetting agent.")
                agent.reset()
                break
        if args.instruction:
            break


if __name__ == "__main__":
    main()
