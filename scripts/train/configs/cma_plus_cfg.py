"""CMA-plus finetune config (reference cma_plus.py): warm-start from the
zero-shot CMA checkpoint, shorter schedule."""

from internnav_tpu.configs.trainer import ExpCfg, IlCfg
from internnav_tpu.model import get_config

exp_cfg = ExpCfg(
    name="cma_plus_train",
    model_name="cma",
    output_dir="checkpoints/cma_plus_train/ckpts",
    tensorboard_dir="checkpoints/cma_plus_train/tensorboard",
    log_dir="checkpoints/cma_plus_train/logs",
    seed=0,
    il=IlCfg(
        epochs=55,
        batch_size=2,
        lr=1e-4,
        weight_decay=1e-5,
        warmup_ratio=0.05,
        use_iw=True,
        inflection_weight_coef=3.2,
        load_from_ckpt=True,
        ckpt_to_load="checkpoints/r2r/zero_shot/cma",
        lerobot_features_dir="data/vln_pe/traj_data/r2r",
        filter_failure={"use": True, "min_rgb_nums": 15},
        report_to="tensorboard",
    ),
    model=get_config("cma"),
)
