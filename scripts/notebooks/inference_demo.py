"""InternVLA-N1 offline inference demo (reference
scripts/notebooks/inference_only_demo.ipynb as a runnable script): run the
dual system on a folder of frames (or synthetic frames), no simulator.

Usage:
    python scripts/notebooks/inference_demo.py --frames <dir-with-jpgs> \
        --instruction "walk to the kitchen" [--ckpt ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def load_frames(path: str, hw: int):
    import cv2

    if path is None:
        rs = np.random.RandomState(0)
        return [rs.randint(0, 255, (hw, hw, 3), np.uint8) for _ in range(6)]
    frames = []
    for name in sorted(os.listdir(path)):
        if name.lower().endswith((".jpg", ".png", ".jpeg")):
            img = cv2.cvtColor(cv2.imread(os.path.join(path, name)), cv2.COLOR_BGR2RGB)
            frames.append(cv2.resize(img, (hw, hw)))
    return frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", default=None)
    ap.add_argument("--instruction", default="go forward and stop at the door")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--image-hw", type=int, default=56)
    args = ap.parse_args()

    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

    cfg = InternVLAN1Config.tiny("nextdit_async")
    policy = InternVLAN1Policy.build(cfg, image_hw=args.image_hw)
    if args.ckpt:
        from internnav_tpu.model.base import Policy, merge_params

        policy.params = merge_params(
            policy.params, Policy.load_params_file(args.ckpt, policy.params)
        )

    frames = load_frames(args.frames, args.image_hw)
    for t, frame in enumerate(frames):
        out = policy.s2_step(frame, args.instruction, max_new_tokens=16)
        print(f"[{t}] llm: {policy.llm_output!r}")
        if out.output_pixel is not None:
            print(f"     pixel goal: {out.output_pixel.tolist()}")
        if out.output_latent is not None:
            rgb2 = np.stack([frames[max(t - 1, 0)], frame])[None]
            s1 = policy.s1_step_latent(rgb2, None, out.output_latent,
                                       num_sample_trajs=8)
            print(f"     S1 actions: {s1.idx}")
        elif out.output_action is not None:
            print(f"     S2 actions: {out.output_action}")


if __name__ == "__main__":
    main()
