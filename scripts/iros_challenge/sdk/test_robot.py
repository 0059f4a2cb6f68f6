"""Robot base smoke test (reference sdk/test_robot.py): send a forward and
both turns through the command sink and read one camera frame."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))

from internnav_tpu.realworld.agilex import AlignedRealSense, RosBaseController  # noqa: E402


def main() -> None:
    cam = AlignedRealSense()
    cam.start()
    frame = cam.capture()
    print("camera ok:", frame["rgb"].shape, frame["depth"].shape)
    base = RosBaseController()
    for name, (v, w) in (("forward", (0.3, 0.0)), ("left", (0.0, 0.4)),
                         ("right", (0.0, -0.4))):
        print("command:", name)
        base.command(v, w, duration_s=1.0)
    cam.stop()


if __name__ == "__main__":
    main()
