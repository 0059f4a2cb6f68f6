from internnav_tpu.evaluator.base import Evaluator, evaluator_registry
from internnav_tpu.evaluator.vln_evaluator import VLNBatchedEvaluator

__all__ = ["Evaluator", "evaluator_registry", "VLNBatchedEvaluator"]
from internnav_tpu.evaluator.vn_evaluator import VNPointGoalEvaluator  # noqa: E402

__all__.append("VNPointGoalEvaluator")
from internnav_tpu.evaluator.vln_pe_evaluator import VLNPEEvaluator  # noqa: E402

__all__.append("VLNPEEvaluator")
from internnav_tpu.evaluator.vln_pipelined_evaluator import (  # noqa: E402
    VLNPipelinedEvaluator,
)

__all__.append("VLNPipelinedEvaluator")
