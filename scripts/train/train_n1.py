"""InternVLA-N1 dual-system finetune entry point.

Reference parity: internnav/trainer/internvla_n1_trainer.py:125-239 (the
torchrun `train()` entry: parse args -> load Qwen2.5-VL backbone -> set_model
selective freeze -> build SFT dataset + packed collator -> HF Trainer) and
scripts/train/qwenvl_train/train_dual_system.sh:40-70 (the launch flags:
tune_mm_llm, freeze vision, lr 2e-5, grad accum, packed data_flatten).

TPU-native assembly: config-file driven (a python module exposing `exp_cfg`,
like the eval configs), mesh from MeshCfg (dp x tp, Megatron TP +
ZeRO-3-style fsdp_rest), packed batches feed the segment-id Pallas flash
attention, grad accumulation via IlCfg.grad_accum_steps (lax.scan microbatch
loop in trainer/base.py).

Usage (smoke, tiny dims on the CPU mesh):
    python scripts/train/train_n1.py --tiny --store /tmp/n1_store.bin \
        --steps 2 --batch-size 2

Real finetune (full 7B dims, converted HF checkpoint):
    python scripts/train/train_n1.py --ckpt /path/to/InternVLA-N1 \
        --store data/sft_store.bin --steps 20000 --batch-size 8 \
        --grad-accum 8 --tune-llm --tp 4
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="n1_finetune")
    ap.add_argument("--config", default=None,
                    help="python file exposing exp_cfg (ExpCfg); CLI flags "
                         "override its il/mesh fields")
    ap.add_argument("--store", required=True,
                    help="trajectory store (native .bin or LeRobot dir via "
                         "LerobotAsTrajStore)")
    ap.add_argument("--ckpt", default=None,
                    help="converted/HF InternVLA-N1 checkpoint dir; omitted "
                         "-> random init at --tiny or 7B dims")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims smoke config (CPU mesh friendly)")
    ap.add_argument("--system1", default="nextdit",
                    choices=["nextdit", "nextdit_async", "navdp_async"])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8,
                    help="samples per packed batch (pre-packing)")
    ap.add_argument("--max-len", type=int, default=2048,
                    help="packed sequence length")
    ap.add_argument("--grad-accum", type=int, default=None,
                    help="gradient accumulation microbatches "
                         "(train_dual_system.sh:65)")
    ap.add_argument("--lr", type=float, default=None,
                    help="reference default 2e-5 (train_dual_system.sh:57)")
    ap.add_argument("--tune-llm", action="store_true", default=True)
    ap.add_argument("--no-tune-llm", dest="tune_llm", action="store_false")
    ap.add_argument("--tune-mm-vision", action="store_true", default=False)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree over the Qwen decoder")
    ap.add_argument("--fsdp", action="store_true",
                    help="pure FSDP sharding (no TP)")
    ap.add_argument("--remat", action="store_true", default=False,
                    help="rematerialize decoder layers in backward "
                         "(jax.checkpoint) — fits packed-8192 steps in "
                         "16 GB at the cost of ~33% more decoder FLOPs")
    ap.add_argument("--opt-state-dtype", default=None,
                    choices=["bf16", "fp32"],
                    help="Adam m/v storage dtype; bf16 halves optimizer "
                         "HBM (trainer/base.py scale_by_adam_sd)")
    ap.add_argument("--ce-chunk", type=int, default=0,
                    help="chunked full-vocab CE: lm_head+softmax per "
                         "N-token chunk under jax.checkpoint, never "
                         "materializing the (B, T, vocab) logits "
                         "(0 = classic full-logits loss)")
    ap.add_argument("--num-history", type=int, default=None)
    ap.add_argument("--image-hw", type=int, default=None,
                    help="square frame size fed to the vision tower "
                         "(default: 28 at --tiny, 224 at full dims)")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--resume", action="store_true", default=True)
    ap.add_argument("--no-resume", dest="resume", action="store_false")
    return ap


def make_batch_iter(store_path: str, policy, cfg_model, batch_size: int,
                    max_len: int, num_history: int, image_hw: int):
    """Infinite iterator of packed SFT batches (reference data_flatten
    packing, internvla_n1_trainer.py:18-104 -> segment-id attention here)."""
    from internnav_tpu.dataset.internvla_n1_dataset import (
        N1SampleDataset,
        n1_packed_collate_fn,
        tokenize_sample,
    )

    tpi = policy._tokens_per_image((image_hw, image_hw))
    ds = N1SampleDataset(store_path,
                         predict_step_nums=cfg_model.predict_step_nums,
                         num_history=num_history)

    def gen():
        while True:
            rows = []
            for s in ds:
                rows.append(tokenize_sample(
                    s, policy.tokenizer, tokens_per_image=tpi,
                    n_query=cfg_model.n_query))
                if len(rows) == batch_size:
                    yield n1_packed_collate_fn(
                        rows, max_len=max_len,
                        predict_step_nums=cfg_model.predict_step_nums)
                    rows = []
            if rows:
                yield n1_packed_collate_fn(
                    rows, max_len=max_len,
                    predict_step_nums=cfg_model.predict_step_nums)

    return gen()


def main(argv=None) -> dict:
    args = build_argparser().parse_args(argv)

    import jax

    # persistent compile cache (repeat invocations skip recompiles)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from internnav_tpu.configs import load_py_config
    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer

    if args.config:
        exp: ExpCfg = load_py_config(args.config, attr="exp_cfg")
    else:
        exp = ExpCfg(name=args.name, model_name="internvla_n1")
    if args.output_dir:
        exp.output_dir = args.output_dir
    if args.lr is not None:
        exp.il.lr = args.lr
    if args.grad_accum is not None:
        exp.il.grad_accum_steps = args.grad_accum
    exp.il.batch_size = args.batch_size
    if args.remat:
        exp.il.remat = True
    if args.ce_chunk:
        exp.il.ce_chunk = args.ce_chunk
    if args.opt_state_dtype:
        exp.il.opt_state_dtype = args.opt_state_dtype
    if args.tp > 1:
        exp.mesh = MeshCfg(axes={"dp": -1, "tp": args.tp},
                           param_sharding="tp", fsdp_rest=True)
    elif args.fsdp:
        exp.mesh = MeshCfg(axes={"dp": -1}, param_sharding="fsdp")

    # il.remat (decoder-layer rematerialization in backward — the knob that
    # makes packed-8192 steps fit a 16 GB chip) is applied by
    # InternVLAN1Trainer at the trainer/config boundary; forward-only paths
    # are unaffected so serving reuses the same checkpoint layout
    cfg_model = (InternVLAN1Config.tiny(args.system1) if args.tiny
                 else InternVLAN1Config.qwen25vl_7b(args.system1))
    if args.num_history is not None:
        import dataclasses
        cfg_model = dataclasses.replace(cfg_model,
                                        num_history=args.num_history)

    image_hw = args.image_hw or (28 if args.tiny else 224)
    if args.ckpt:
        policy = InternVLAN1Policy.from_pretrained_torch(args.ckpt, cfg_model)
    else:
        policy = InternVLAN1Policy.build(cfg_model, image_hw=image_hw)

    trainer = InternVLAN1Trainer(
        exp, policy, total_steps=args.steps,
        tune_llm=args.tune_llm, tune_mm_vision=args.tune_mm_vision)

    num_history = (args.num_history if args.num_history is not None
                   else cfg_model.num_history)
    raw = make_batch_iter(args.store, policy, cfg_model, args.batch_size,
                          args.max_len, num_history, image_hw)
    # host-side vision encode (frozen tower default) + rope-index build,
    # then the sharded jit train step consumes the prepared batch. The jit
    # step donates trainer.params, so the policy must be repointed at the
    # live tree before each host-side encode.
    def prepared():
        for b in raw:
            trainer.policy.params = trainer.params
            yield trainer.prepare_batch(b)

    trainer.dataset = prepared()
    if args.resume:
        trainer.maybe_restore()
    metrics = trainer.train(resume=False)
    print("final:", metrics)
    return metrics


if __name__ == "__main__":
    main()
