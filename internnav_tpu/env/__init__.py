from internnav_tpu.env.base import Env, env_registry
from internnav_tpu.env.episodes import (
    Episode,
    ResumableEpisodeLoader,
    group_by_scene,
    load_r2r_episodes,
    shard_episodes,
)
from internnav_tpu.env.fake_env import FakeEnv
from internnav_tpu.env.internutopia.env import InternutopiaEnv
from internnav_tpu.env.metrics import VLNPEMetrics, aggregate_metrics, ndtw, simplified_ndtw

__all__ = [
    "Env", "env_registry", "Episode", "ResumableEpisodeLoader",
    "group_by_scene", "load_r2r_episodes", "shard_episodes", "FakeEnv",
    "InternutopiaEnv",
    "VLNPEMetrics", "aggregate_metrics", "ndtw", "simplified_ndtw",
]
