from internnav_tpu.dialog.dialog_agent import DialogAgent, pixel_to_gps
from internnav_tpu.dialog.evaluator import HabitatDialogEvaluator
from internnav_tpu.dialog.mp3d import MP3DGTPerception, fill_small_holes
from internnav_tpu.dialog.npc import SimpleNPC

__all__ = ["DialogAgent", "pixel_to_gps", "HabitatDialogEvaluator",
           "SimpleNPC", "MP3DGTPerception", "fill_small_holes"]
