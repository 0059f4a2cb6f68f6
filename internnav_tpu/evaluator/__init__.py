from internnav_tpu.evaluator.base import Evaluator, evaluator_registry
from internnav_tpu.evaluator.vln_evaluator import VLNBatchedEvaluator

__all__ = ["Evaluator", "evaluator_registry", "VLNBatchedEvaluator"]
