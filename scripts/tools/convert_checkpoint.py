"""Convert a reference-format torch checkpoint to the native format.

`Policy.from_pretrained` already loads torch checkpoints directly
(auto-detected, converted in memory on every load); this CLI does the
conversion ONCE and writes a native `save_pretrained` directory
(config.json + params.msgpack), which loads faster and needs no torch at
deployment time.

Usage:
    python scripts/tools/convert_checkpoint.py --model cma \
        --src checkpoints/r2r/zero_shot/cma --dst converted/cma
    python scripts/tools/convert_checkpoint.py --model internvla_n1 \
        --src /path/to/InternVLA-N1 --dst converted/n1 [--int8|--int4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["cma", "seq2seq", "rdp", "navdp",
                             "internvla_n1"])
    ap.add_argument("--src", required=True,
                    help="torch checkpoint (.pth/.safetensors file or dir)")
    ap.add_argument("--dst", required=True, help="output directory")
    ap.add_argument("--int8", action="store_true",
                    help="internvla_n1 only: quantize the decoder to the "
                         "W8A8 serving format before saving")
    ap.add_argument("--int4", action="store_true",
                    help="internvla_n1 only: W4A8 (grouped-128) format")
    args = ap.parse_args()

    if args.int8 and args.int4:
        ap.error("--int8 and --int4 are mutually exclusive")
    if (args.int8 or args.int4) and args.model != "internvla_n1":
        ap.error("--int8/--int4 apply only to --model internvla_n1")

    if args.model == "internvla_n1":
        from internnav_tpu.model.basemodel.internvla_n1.model import (
            InternVLAN1Config,
        )
        from internnav_tpu.model.basemodel.internvla_n1.policy import (
            InternVLAN1Policy,
        )

        wdt = "int4" if args.int4 else ("int8" if args.int8 else "bf16")
        cfg = InternVLAN1Config.qwen25vl_7b(weight_dtype=wdt)
        pol = InternVLAN1Policy.from_pretrained_torch(args.src, cfg)
        pol.save_pretrained(args.dst)
        # carry the tokenizer assets over so the native checkpoint loads
        # the real Qwen BPE tokenizer (from_pretrained falls back to the
        # hash SimpleTokenizer only when none are present)
        import os
        import shutil

        if os.path.isdir(args.src):
            for name in ("tokenizer.json", "tokenizer_config.json",
                         "vocab.json", "merges.txt",
                         "special_tokens_map.json", "chat_template.json",
                         "preprocessor_config.json", "generation_config.json"):
                p = os.path.join(args.src, name)
                if os.path.exists(p):
                    shutil.copy2(p, os.path.join(args.dst, name))
    else:
        from internnav_tpu.model import get_config, get_policy

        pol = get_policy(args.model).from_pretrained(
            args.src, get_config(args.model))
        pol.save_pretrained(args.dst)
    print(f"converted {args.model}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
