"""InternVLA-N1 pipelined multi-cohort serving eval on the offline fake
env — the flagship throughput configuration (docs/BENCH_METHOD.md).

Tiny random-init config so it runs anywhere; for real checkpoints set
agent.ckpt_path to a reference-format checkpoint directory and drop
model_settings["config"] (the agent then loads at the true 7B dims,
internnav_tpu/agent/internvla_n1_agent.py:_build_n1_policy).
Run scripts/tools/make_fake_dataset.py first.
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
                             "cohorts": 2}),
    task=TaskCfg(max_step=12, metric_config=MetricCfg(success_distance=3.0)),
    dataset=EvalDatasetCfg(
        base_data_dir="data/fake_r2r",
        split_data_types=["val_unseen"],
        max_episodes=4,
    ),
    eval_type="vln_pipelined",
    output_dir="logs/eval/fake_n1_pipelined",
)
