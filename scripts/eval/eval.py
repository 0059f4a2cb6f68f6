"""Evaluation driver (reference scripts/eval/eval.py:33-49).

Usage: python scripts/eval/eval.py --config scripts/eval/configs/fake_cma_cfg.py
The config file is executable python exposing `eval_cfg` (an EvalCfg).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from internnav_tpu.configs import load_py_config  # noqa: E402
from internnav_tpu.evaluator import Evaluator  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="python config file exposing eval_cfg")
    args = ap.parse_args()
    cfg = load_py_config(args.config)
    if cfg.eval_type == "vln_pe":
        # defaults-merging assembly for the VLN-PE pipeline (reference
        # eval.py:33-49 applies vln_default_config.get_config)
        from internnav_tpu.configs.vln_default import get_config

        cfg = get_config(cfg)
    metrics = Evaluator.init(cfg).eval()
    print(metrics)


if __name__ == "__main__":
    main()
