"""VL-LN dialog (IIGN) eval config (reference habitat_dialog_cfg.py)."""

from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg

eval_cfg = EvalCfg(
    agent=AgentCfg(model_name="dialog",
                   model_settings={"max_questions": 3}),
    env=EnvCfg(env_type="habitat",
               env_settings={
                   "habitat_config": "scripts/eval/configs/instance_dialog.yaml"
               }),
    task=TaskCfg(max_step=195),
    dataset=EvalDatasetCfg(base_data_dir="data/vl_ln", split_data_types=["val_unseen"]),
    eval_type="habitat_vln",
    eval_settings={"mode": "dual_system"},
    output_dir="logs/eval/habitat_dialog",
)
