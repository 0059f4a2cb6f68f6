from internnav_tpu.habitat.evaluator import (
    HabitatDefaultEvaluator,
    HabitatVLNEvaluator,
    preprocess_depth,
)
from internnav_tpu.habitat.measures import compute_all
from internnav_tpu.habitat.sim_adapter import FakeSim

__all__ = ["HabitatVLNEvaluator", "HabitatDefaultEvaluator", "preprocess_depth",
           "compute_all", "FakeSim"]
