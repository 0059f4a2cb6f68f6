"""InternVLA-N1 pipelined serving with SHARED GROUPED DECODE + GROUPED
SYSTEM-1: every
cohort's greedy S2 decode + traj-latent chunk runs as ONE device program,
so the ~6.5 GB/token (7B int8) decoder weight stream is paid once per
token for ALL cohorts instead of once per cohort. Per-episode results are
identical to the per-cohort fused path
(tests/test_batched_agent_e2e.py::test_pipelined_evaluator_shared_decode_matches).

Tiny random-init config so it runs anywhere; see
fake_n1_pipelined_cfg.py for the real-checkpoint knobs.
"""

from internnav_tpu.configs import (
    AgentCfg,
    EnvCfg,
    EvalCfg,
    EvalDatasetCfg,
    MetricCfg,
    TaskCfg,
)
from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config

eval_cfg = EvalCfg(
    agent=AgentCfg(
        model_name="internvla_n1_batched",
        model_settings={
            "batch_size": 2,
            "max_new_tokens": 8,
            "num_sample_trajs": 4,
            "config": InternVLAN1Config.tiny("nextdit_async"),
        },
    ),
    env=EnvCfg(env_type="fake", env_num=2,
               env_settings={"rgb_resolution": [56, 56],
                             "depth_resolution": [56, 56],
                             "cohorts": 2,
                             "shared_decode": True,
                             "shared_s1": True}),
    task=TaskCfg(max_step=12, metric_config=MetricCfg(success_distance=3.0)),
    dataset=EvalDatasetCfg(
        base_data_dir="data/fake_r2r",
        split_data_types=["val_unseen"],
        max_episodes=4,
    ),
    eval_type="vln_pipelined",
    output_dir="logs/eval/fake_n1_shared_decode",
)
