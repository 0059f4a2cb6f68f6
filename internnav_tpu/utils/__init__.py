from internnav_tpu.utils.logging import ProgressLogger, get_logger
from internnav_tpu.utils.metric_logger import MetricLogger, SmoothedValue
from internnav_tpu.utils.misc import batch_obs, set_seed, tree_device_put, unbatch_obs
from internnav_tpu.utils.registry import Registry

__all__ = [
    "ProgressLogger",
    "get_logger",
    "MetricLogger",
    "SmoothedValue",
    "batch_obs",
    "set_seed",
    "tree_device_put",
    "unbatch_obs",
    "Registry",
]
