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
# habitat-family evaluators register themselves on import; Evaluator.init
# lazy-imports their modules (base.py:_LAZY_EVALUATOR_MODULES) so the CLI
# resolves eval_type='habitat_vln'/'habitat_dialog' without this package
# eagerly importing internnav_tpu.dialog (which itself imports
# evaluator.base — an eager import here would be circular). Expose the
# classes via module __getattr__ for `from internnav_tpu.evaluator import
# HabitatVLNEvaluator` convenience.
_LAZY = {
    "HabitatVLNEvaluator": "internnav_tpu.habitat.evaluator",
    "HabitatDefaultEvaluator": "internnav_tpu.habitat.evaluator",
    "HabitatDialogEvaluator": "internnav_tpu.dialog.evaluator",
}
__all__ += sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
