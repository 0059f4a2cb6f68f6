"""Trainer / experiment config schemas.

Reference: internnav/configs/trainer/{exp,il,eval,task}.py — ExpCfg
(name, dirs, eval, il, model), IlCfg (epochs/batch/lr/data dirs/...).
TPU additions: mesh/sharding spec and dtype policy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, ConfigDict

from internnav_tpu.configs.model import ModelCfg


class _Cfg(BaseModel):
    model_config = ConfigDict(extra="allow")


class MeshCfg(_Cfg):
    """TPU device-mesh layout: axis name → size; -1 means 'all remaining'."""

    axes: Dict[str, int] = {"dp": -1}
    # partitioning strategy for params: 'replicated' | 'fsdp' | 'tp'
    param_sharding: str = "replicated"
    fsdp_axis: str = "dp"
    tp_axis: Optional[str] = None
    # with param_sharding='tp': also FSDP-shard the non-TP params over the
    # fsdp/dp axis (ZeRO-3 of the rest, the 64-GPU ZeRO-2 equivalent)
    fsdp_rest: bool = False
    remat: bool = False  # jax.checkpoint on block boundaries


class IlCfg(_Cfg):
    epochs: int = 10
    batch_size: int = 8
    lr: float = 1e-4
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_schedule: str = "cosine"  # cosine | linear | constant
    max_grad_norm: float = 1.0
    #: microbatches accumulated per optimizer step (reference inherits this
    #: from HF TrainingArguments, train_dual_system.sh:65 — needed to match
    #: the 64-GPU effective batch on a small TPU slice). The global batch is
    #: split into this many microbatches inside ONE jitted step (lax.scan),
    #: gradients averaged, one optimizer update.
    grad_accum_steps: int = 1
    #: keep an EMA of the params (diffusion trainers; the reference imports
    #: diffusion_policy's EMAModel). Decay follows trainer/ema.py's
    #: power-warmup schedule.
    use_ema: bool = False
    lmdb_features_dir: Optional[str] = None
    lerobot_features_dir: Optional[str] = None
    dataset_root_dir: Optional[str] = None
    dataset_type: str = "lmdb"  # lmdb | lerobot | fake
    filter_failure: Dict[str, Any] = {"use": True, "min_rgb_nums": 5}
    inflection_weight_coef: float = 3.2
    use_iw: bool = True
    ckpt_to_load: Optional[str] = None
    load_from_ckpt: bool = False
    load_from_pretrain: bool = False
    num_workers: int = 1
    save_interval_steps: int = 500
    log_interval_steps: int = 10
    report_to: str = "none"  # none | tensorboard
    seed: int = 0
    #: rematerialize decoder layers during backward (jax.checkpoint on
    #: block boundaries) — activations recomputed instead of stored, the
    #: trade that fits packed-8192 steps on one 16 GB chip. Wired into the
    #: model config by the train entry scripts (train_n1.py).
    remat: bool = False
    #: chunked full-vocab cross-entropy: >0 runs the lm_head + softmax-CE
    #: per `ce_chunk`-token sequence chunk under jax.checkpoint so the
    #: (B, T, vocab) fp32 logits (5 GB at packed-8192 x 152k vocab) are
    #: never materialized; 0 = classic full-logits path.
    ce_chunk: int = 0
    #: storage dtype for Adam's m/v moments ("bf16" halves optimizer HBM —
    #: 12.5 GB -> 6.2 GB for the 1.56B trainable params of a full-width-7B
    #: two-layer + embeddings step — the lever that fits packed-8192 N1
    #: training on one 16 GB chip; moments are still UPDATED in fp32 each
    #: step, see trainer/base.py scale_by_adam_sd). None/"fp32" keeps
    #: optax.adamw's stock fp32 state.
    opt_state_dtype: Optional[str] = None


class TrainEvalCfg(_Cfg):
    use_ckpt_config: bool = False
    save_results: bool = True
    split: List[str] = ["val_unseen"]
    max_steps: int = 195
    sample: bool = False
    success_distance: float = 3.0


class ExpCfg(_Cfg):
    name: str = "exp"
    model_name: str = "cma"
    torch_gpu_id: int = 0  # kept for config-surface parity; unused on TPU
    output_dir: str = "logs/train"
    checkpoint_folder: str = "checkpoints"
    tensorboard_dir: str = "logs/tb"
    log_dir: str = "logs"
    seed: int = 0
    eval: TrainEvalCfg = TrainEvalCfg()
    il: IlCfg = IlCfg()
    model: ModelCfg = ModelCfg()
    mesh: MeshCfg = MeshCfg()
