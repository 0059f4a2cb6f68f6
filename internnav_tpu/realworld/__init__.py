from internnav_tpu.realworld.controllers import (
    MPCController,
    PIDController,
    trajectory_to_vw,
)
from internnav_tpu.realworld.env import RealWorldEnv
from internnav_tpu.realworld.server import RealWorldServer, encode_npy

__all__ = ["MPCController", "PIDController", "trajectory_to_vw",
           "RealWorldEnv", "RealWorldServer", "encode_npy"]
# hardware glue (AlignedRealSense / RosBaseController / ObsRecorder) lives in
# internnav_tpu.realworld.agilex; imports stay lazy because the module's
# constructors touch pyrealsense2/rospy
