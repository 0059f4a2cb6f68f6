"""Isaac Sim / InternUtopia VLN-PE environment layer.

- env.InternutopiaEnv: the registered "internutopia" env (Isaac backend
  import-guarded; "fake_physics" backend for simulator-free testing)
- vec_env.FakePhysicsVecEnv: kinematic vec env speaking the
  substep/finish_action protocol (VLNEvalTask semantics)
- loco: H1 locomotion controller port (height scan + jitted MLP policy)
- isaac_ext: Isaac-side registrations (task/camera/robot/controllers)
"""

from internnav_tpu.env.internutopia.env import InternutopiaEnv, import_extensions
from internnav_tpu.env.internutopia.loco import (
    DynamicHeightSamples,
    H1RobotState,
    H1SpeedController,
    convert_loco_policy,
    init_height_points,
    make_loco_mlp,
)
from internnav_tpu.env.internutopia.vec_env import FakePhysicsVecEnv

__all__ = [
    "InternutopiaEnv", "import_extensions", "FakePhysicsVecEnv",
    "H1SpeedController", "H1RobotState", "DynamicHeightSamples",
    "init_height_points", "make_loco_mlp", "convert_loco_policy",
]
