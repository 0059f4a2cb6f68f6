"""IROS-challenge RDP finetune on the kujiale scenes (reference
challenge_train_kujiale_cfg.py): warm-start from the released RDP ckpt."""

from internnav_tpu.configs.trainer import ExpCfg, IlCfg
from internnav_tpu.model import get_config

exp_cfg = ExpCfg(
    name="challenge_rdp_kujiale",
    model_name="rdp",
    output_dir="checkpoints/challenge_rdp_kujiale/ckpts",
    tensorboard_dir="checkpoints/challenge_rdp_kujiale/tensorboard",
    log_dir="checkpoints/challenge_rdp_kujiale/logs",
    seed=0,
    il=IlCfg(
        epochs=50,
        batch_size=8,
        lr=5e-5,
        use_ema=True,
        load_from_ckpt=True,
        ckpt_to_load="checkpoints/r2r/fine_tuned/rdp",
        lerobot_features_dir="data/vln_pe/traj_data/kujiale",
        filter_failure={"use": True, "min_rgb_nums": 15},
        report_to="tensorboard",
    ),
    model=get_config("rdp"),
)
