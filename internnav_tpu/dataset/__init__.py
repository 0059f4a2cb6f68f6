from internnav_tpu.dataset.base import (
    Prefetcher,
    TrajectoryDataset,
    batch_iterator,
    inflection_weights,
    repeat_forever,
)
from internnav_tpu.dataset.traj_store import TrajStore

__all__ = [
    "Prefetcher", "TrajectoryDataset", "batch_iterator", "inflection_weights",
    "repeat_forever", "TrajStore",
]
