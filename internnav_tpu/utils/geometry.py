"""Geometry utilities (numpy + jax variants).

Same capability surface as the reference's internnav/utils/geometry_utils.py
(yaw_rotmat:31, to_local_coords:52, batch variants:78/105, compute_actions:138,
get_delta:202, normalize_data:265, quat/euler conversions:317-441), written
numpy-first with jnp-compatible batched versions for use inside jit.

Coordinate convention follows the reference datasets: world positions are
(x, y) in the ground plane, yaw measured counter-clockwise from +x.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

try:  # jax variants are optional so host-only tools can import this module
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


# ---------------------------------------------------------------- rotations
def yaw_from_quat_wxyz(q) -> float:
    """Yaw of a (w, x, y, z) quaternion — THE canonical copy (used by
    the Isaac flash controllers, vec_env pose handling, loco obs)."""
    w, x, y, z = (float(v) for v in np.asarray(q, np.float64).ravel()[:4])
    return float(np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z)))


def quat_wxyz_from_yaw(yaw: float) -> np.ndarray:
    """Pure-yaw (w, x, y, z) quaternion (roll/pitch zero)."""
    return np.array([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])


def yaw_rotmat(yaw: float) -> np.ndarray:
    """2x2 rotation matrix for a scalar yaw."""
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s], [s, c]], dtype=np.float64)


def to_local_coords(positions: np.ndarray, curr_pos: np.ndarray, curr_yaw: float) -> np.ndarray:
    """World → robot-local frame: translate by -curr_pos, rotate by -curr_yaw."""
    rot = yaw_rotmat(curr_yaw)
    return (np.asarray(positions) - np.asarray(curr_pos)) @ rot  # R(-yaw) = R(yaw)^T applied on the right


def yaw_rotmat_batch(yaws):
    """(..., ) yaws → (..., 2, 2) rotation matrices. Works for np or jnp."""
    xp = jnp if (jnp is not None and not isinstance(yaws, np.ndarray)) else np
    c, s = xp.cos(yaws), xp.sin(yaws)
    row0 = xp.stack([c, -s], axis=-1)
    row1 = xp.stack([s, c], axis=-1)
    return xp.stack([row0, row1], axis=-2)


def to_local_coords_batch(positions, curr_pos, curr_yaw):
    """Batched world → local. positions (..., T, 2), curr_pos (..., 2), curr_yaw (...)."""
    xp = jnp if (jnp is not None and not isinstance(np.asarray(curr_yaw), np.ndarray)) else np
    rot = yaw_rotmat_batch(curr_yaw)  # (..., 2, 2)
    rel = positions - curr_pos[..., None, :]
    return rel @ rot


# ----------------------------------------------------------------- actions
def compute_actions(
    positions: np.ndarray,
    yaws: np.ndarray,
    curr_index: int,
    horizon: int,
    waypoint_spacing: int = 1,
    learn_angle: bool = True,
    metric_waypoint_spacing: float = 1.0,
) -> np.ndarray:
    """Future waypoints in the current local frame.

    Returns (horizon, 2) Δ(x, y) — or (horizon, 3) with Δyaw appended when
    learn_angle — expressed relative to the pose at curr_index, sampled every
    waypoint_spacing steps and padded by repeating the last pose past the
    trajectory end (reference semantics: geometry_utils.py:138-201).
    """
    positions = np.asarray(positions, dtype=np.float64)
    yaws = np.asarray(yaws, dtype=np.float64)
    T = len(positions)
    idx = np.minimum(
        curr_index + np.arange(1, horizon + 1) * waypoint_spacing, T - 1
    )
    future_pos = positions[idx]
    local = to_local_coords(future_pos, positions[curr_index], yaws[curr_index])
    local = local / max(metric_waypoint_spacing, 1e-9)
    if learn_angle:
        dyaw = _wrap_angle(yaws[idx] - yaws[curr_index])[:, None]
        return np.concatenate([local, dyaw], axis=-1).astype(np.float32)
    return local.astype(np.float32)


def get_delta(actions: np.ndarray) -> np.ndarray:
    """Cumulative waypoints → per-step deltas (reference geometry_utils.py:202)."""
    actions = np.asarray(actions)
    padded = np.concatenate([np.zeros_like(actions[..., :1, :]), actions], axis=-2)
    return np.diff(padded, axis=-2)


def undo_delta(deltas):
    """Per-step deltas → cumulative waypoints (inverse of get_delta)."""
    xp = jnp if (jnp is not None and not isinstance(deltas, np.ndarray)) else np
    return xp.cumsum(deltas, axis=-2)


def normalize_data(data, stats: Dict[str, np.ndarray]):
    """Scale into [-1, 1] with dataset min/max stats (geometry_utils.py:265)."""
    dmin, dmax = np.asarray(stats["min"]), np.asarray(stats["max"])
    scale = np.maximum(dmax - dmin, 1e-8)
    return (np.asarray(data) - dmin) / scale * 2.0 - 1.0


def unnormalize_data(data, stats: Dict[str, np.ndarray]):
    dmin, dmax = np.asarray(stats["min"]), np.asarray(stats["max"])
    scale = np.maximum(dmax - dmin, 1e-8)
    return (np.asarray(data) + 1.0) / 2.0 * scale + dmin


def _wrap_angle(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def wrap_angle(a):
    """Wrap to (-pi, pi]; numpy or jnp."""
    xp = jnp if (jnp is not None and not isinstance(np.asarray(a), np.ndarray)) else np
    return (a + xp.pi) % (2 * xp.pi) - xp.pi


# ------------------------------------------------------------- quaternions
def quat_to_rot_matrix(quat: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion → 3x3 rotation (geometry_utils.py:317)."""
    w, x, y, z = np.asarray(quat, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n < 1e-12 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def rot_matrix_to_euler(mat: np.ndarray, degrees: bool = False) -> np.ndarray:
    """3x3 rotation → extrinsic xyz euler angles (geometry_utils.py:342)."""
    mat = np.asarray(mat, dtype=np.float64)
    sy = np.sqrt(mat[0, 0] ** 2 + mat[1, 0] ** 2)
    if sy > 1e-6:
        roll = np.arctan2(mat[2, 1], mat[2, 2])
        pitch = np.arctan2(-mat[2, 0], sy)
        yaw = np.arctan2(mat[1, 0], mat[0, 0])
    else:  # gimbal lock
        roll = np.arctan2(-mat[1, 2], mat[1, 1])
        pitch = np.arctan2(-mat[2, 0], sy)
        yaw = 0.0
    out = np.array([roll, pitch, yaw])
    return np.degrees(out) if degrees else out


def quat_to_euler_angles(quat: np.ndarray, degrees: bool = False) -> np.ndarray:
    return rot_matrix_to_euler(quat_to_rot_matrix(quat), degrees=degrees)


def euler_to_quat(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """Extrinsic xyz euler → (w, x, y, z) quaternion."""
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ]
    )


# ------------------------------------------------------------ camera geometry
def camera_intrinsics(width: int, height: int, hfov_deg: float) -> np.ndarray:
    """Pinhole K from horizontal FOV (reference habitat_extensions/vln/utils.py)."""
    fx = (width / 2.0) / np.tan(np.radians(hfov_deg) / 2.0)
    fy = fx
    return np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1.0]])


def pixel_to_camera(pixel_uv: np.ndarray, depth: float, K: np.ndarray) -> np.ndarray:
    """Unproject a pixel at given metric depth into the camera frame."""
    u, v = pixel_uv
    x = (u - K[0, 2]) * depth / K[0, 0]
    y = (v - K[1, 2]) * depth / K[1, 1]
    return np.array([x, y, depth])


def pixel_to_world(
    pixel_uv: np.ndarray, depth: float, K: np.ndarray, tf_camera_to_world: np.ndarray
) -> np.ndarray:
    """Pixel+depth → world point via a 4x4 camera-to-world transform
    (reference pixel_to_gps path: habitat_vln_evaluator.py:715-809)."""
    pc = np.append(pixel_to_camera(pixel_uv, depth, K), 1.0)
    return (tf_camera_to_world @ pc)[:3]
