from internnav_tpu.dialog.dialog_agent import DialogAgent, pixel_to_gps
from internnav_tpu.dialog.evaluator import HabitatDialogEvaluator
from internnav_tpu.dialog.npc import SimpleNPC

__all__ = ["DialogAgent", "pixel_to_gps", "HabitatDialogEvaluator", "SimpleNPC"]
