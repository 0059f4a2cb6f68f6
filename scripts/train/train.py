"""Small-model training driver.

Reference parity: scripts/train/base_train/train.py:75-325 (tyro CLI with
name/model_name, dataset selection, trainer dispatch). tyro isn't
installed; argparse provides the same surface. Config files are python
modules exposing `exp_cfg` (an ExpCfg), like the eval configs.

Usage:
    python scripts/train/train.py --name cma_train --model-name cma \
        --store data/trajectories.bin --steps 1000 --batch-size 8
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="exp")
    ap.add_argument("--model-name", default="cma",
                    choices=["cma", "seq2seq", "rdp", "navdp"])
    ap.add_argument("--config", default=None, help="python file exposing exp_cfg")
    ap.add_argument("--store", required=False, help="trajectory store path")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--fsdp", action="store_true", help="FSDP param sharding")
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--ckpt-to-load", default=None,
                    help="warm-start checkpoint (native save_pretrained dir "
                         "or reference-format torch .pth/.safetensors; "
                         "overrides cfg.il.ckpt_to_load)")
    args = ap.parse_args()

    from internnav_tpu.configs import load_py_config
    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.dataset.base import Prefetcher, repeat_forever
    from internnav_tpu.model import get_config, get_policy

    if args.config:
        cfg: ExpCfg = load_py_config(args.config, attr="exp_cfg")
    else:
        cfg = ExpCfg(name=args.name, model_name=args.model_name,
                     model=get_config(args.model_name))
    if args.lr:
        cfg.il.lr = args.lr
    cfg.il.batch_size = args.batch_size
    if args.fsdp:
        cfg.mesh = MeshCfg(axes={"dp": -1}, param_sharding="fsdp")

    policy_cls = get_policy(cfg.model_name)
    if args.ckpt_to_load:
        cfg.il.ckpt_to_load = args.ckpt_to_load
    if cfg.il.ckpt_to_load:
        # warm-start (reference base_train/train.py:127: from_pretrained on
        # il.ckpt_to_load — the cma_plus/seq2seq_plus finetune recipe);
        # native msgpack dirs and torch checkpoints both load (auto-detect)
        policy = policy_cls.from_pretrained(cfg.il.ckpt_to_load, cfg.model)
    else:
        policy = policy_cls.build(cfg.model)

    if cfg.model_name in ("cma", "seq2seq"):
        from internnav_tpu.dataset.vln_dataset import make_vln_dataloader
        from internnav_tpu.trainer.cma_trainer import CMATrainer, Seq2SeqTrainer

        make_epoch = make_vln_dataloader(args.store, cfg.il.batch_size)
        trainer_cls = CMATrainer if cfg.model_name == "cma" else Seq2SeqTrainer
    elif cfg.model_name == "rdp":
        from internnav_tpu.dataset.rdp_dataset import make_rdp_dataloader
        from internnav_tpu.trainer.rdp_trainer import RDPTrainer

        make_epoch = make_rdp_dataloader(args.store, cfg.il.batch_size)
        trainer_cls = RDPTrainer
    else:
        from internnav_tpu.dataset.navdp_dataset import make_navdp_dataloader
        from internnav_tpu.trainer.navdp_trainer import NavDPTrainer

        make_epoch = make_navdp_dataloader(args.store, cfg.il.batch_size)
        trainer_cls = NavDPTrainer

    data = Prefetcher(repeat_forever(make_epoch))
    trainer = trainer_cls(cfg, policy, dataset=data, total_steps=args.steps)
    metrics = trainer.train(resume=args.resume)
    print("final:", metrics)
    policy.save_pretrained(f"{cfg.output_dir}/{cfg.name}_final")


if __name__ == "__main__":
    main()
