"""Top-down occupancy maps for collision-checked teleport controllers.

Reference parity: the VLN-PE flash-with-collision controller builds a
binary free-space map from a top-down depth camera and checks teleport
targets against it
(internnav/env/utils/internutopia_extension/controllers/
vln_move_by_flash_with_collision_controller.py:103-160) using the
map-pixel<->world transforms in evaluator/utils/path_plan.py:14-42.

This module supplies the same pieces decoupled from Isaac: pure
transforms, the height-band free-space extraction, and a factory that
turns (depth provider, camera pose) into the `is_occupied(x, y)`
callable consumed by env/controllers.py:FlashCollisionController — so
the sim extension only wires sensors, and everything here is testable
headlessly.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

#: reference default: 10 map pixels per (aperture/width) world units
_SCALE = 10.0


def world_to_map_pixel(world_xy: Sequence[float], camera_xy: Sequence[float],
                       aperture: float, width: int,
                       height: int) -> Tuple[float, float]:
    """World (x, y) → top-down map pixel (px, py) (path_plan.py:28-42:
    scale by 10/aperture, recenter on the camera, flip the x axis)."""
    cx = camera_xy[0] * _SCALE / aperture * width
    cy = -camera_xy[1] * _SCALE / aperture * height
    X = world_xy[0] * _SCALE / aperture * width
    Y = -world_xy[1] * _SCALE / aperture * height
    px = width - (X - cx + width / 2.0)
    py = Y - cy + height / 2.0
    return px, py


def map_pixel_to_world(pixel_xy: Sequence[float], camera_xy: Sequence[float],
                       aperture: float, width: int,
                       height: int) -> Tuple[float, float]:
    """Inverse of world_to_map_pixel (path_plan.py:14-26)."""
    cx = camera_xy[0] * _SCALE / aperture * width
    cy = -camera_xy[1] * _SCALE / aperture * height
    px = height - pixel_xy[0] + cx - height / 2.0
    py = pixel_xy[1] + cy - width / 2.0
    world_x = px / _SCALE / height * aperture
    world_y = -py / _SCALE / width * aperture
    return world_x, world_y


def free_map_from_topdown_depth(depth: np.ndarray, base_height: float,
                                robot_type: str = "h1",
                                ankle_height: Optional[float] = None,
                                max_height: float = 1.55 + 8) -> np.ndarray:
    """Binary free-space map (1 = free, 0 = occupied/invalid) from a
    top-down depth image, by the reference's per-robot height bands
    (vln_move_by_flash_with_collision_controller.py:120-137):

    - h1: free where depth in [base+0.6, max) — standing clearance — or
      in (0.02, 0.5] (floor readings right under the camera);
    - aliengo: free where depth in [base-ankle+0.05, max).
    """
    depth = np.asarray(depth, np.float32)
    if robot_type == "aliengo":
        lo = base_height - float(ankle_height or 0.0) + 0.05
        mask = (depth >= lo) & (depth < max_height)
    else:
        lo = base_height + 0.6
        mask = ((depth >= lo) & (depth < max_height)) \
            | ((depth <= 0.5) & (depth > 0.02))
    return mask.astype(np.int32)


def make_occupancy_checker(get_depth: Callable[[], np.ndarray],
                           get_camera_xy: Callable[[], Sequence[float]],
                           get_base_height: Callable[[], float],
                           resolution: Tuple[int, int],
                           aperture: float = 200.0,
                           robot_type: str = "h1",
                           get_ankle_height: Optional[Callable[[], float]] = None,
                           robot_size: int = 3) -> Callable[[float, float], bool]:
    """Build the `is_occupied(x, y)` callable for
    FlashCollisionController: refresh the free map from the current
    top-down depth, project the world target to a map pixel, and report
    occupied when ANY cell of the (2*robot_size)^2 footprint is not free
    (reference check_collision, :139-160). Out-of-map targets count as
    occupied (the reference would index out of bounds there)."""
    width, height = int(resolution[0]), int(resolution[1])

    def is_occupied(x: float, y: float) -> bool:
        free = free_map_from_topdown_depth(
            get_depth(), get_base_height(), robot_type,
            ankle_height=get_ankle_height() if get_ankle_height else None)
        px, py = world_to_map_pixel((x, y), get_camera_xy(), aperture,
                                    width, height)
        px_i, py_i = int(px), int(py)
        lo_x, hi_x = px_i - robot_size, px_i + robot_size
        lo_y, hi_y = py_i - robot_size, py_i + robot_size
        if lo_x < 0 or lo_y < 0 or hi_x > free.shape[0] or hi_y > free.shape[1]:
            return True
        return bool(np.any(free[lo_x:hi_x, lo_y:hi_y] == 0))

    return is_occupied
