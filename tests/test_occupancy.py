"""Top-down occupancy: pixel<->world transforms, height-band free maps,
and the is_occupied factory wired into FlashCollisionController
(reference vln_move_by_flash_with_collision_controller.py:103-160 +
path_plan.py:14-42)."""

import numpy as np

from internnav_tpu.env.occupancy import (
    free_map_from_topdown_depth,
    make_occupancy_checker,
    map_pixel_to_world,
    world_to_map_pixel,
)

APERTURE, W, H = 200.0, 100, 100


def test_pixel_world_round_trip():
    cam = (3.0, -2.0)
    for wx, wy in [(0.0, 0.0), (2.5, 1.0), (-4.0, 3.25), (3.0, -2.0)]:
        px, py = world_to_map_pixel((wx, wy), cam, APERTURE, W, H)
        bx, by = map_pixel_to_world((px, py), cam, APERTURE, W, H)
        np.testing.assert_allclose((bx, by), (wx, wy), atol=1e-9)
    # camera recentering: the camera's own position maps to map center
    px, py = world_to_map_pixel(cam, cam, APERTURE, W, H)
    np.testing.assert_allclose((px, py), (W / 2, H / 2), atol=1e-9)


def test_non_square_resolution_consistency():
    """The transforms stay exact inverses and the checker indexes the
    (height, width) map correctly at non-square resolutions (the
    reference's formulas only agree with their own inverse at square
    maps — corrected here, equal at the square map the reference ships)."""
    W2, H2 = 120, 80
    cam = (1.0, 0.5)
    for wx, wy in [(0.0, 0.0), (2.0, -1.5), (-3.0, 4.0)]:
        r, c = world_to_map_pixel((wx, wy), cam, APERTURE, W2, H2)
        bx, by = map_pixel_to_world((r, c), cam, APERTURE, W2, H2)
        np.testing.assert_allclose((bx, by), (wx, wy), atol=1e-9)

    # obstacle at world (2, 0) with camera at origin:
    # row = H2 - (2*10/200*H2 + H2/2) = 80 - 48 = 32, col = W2/2 = 60
    depth = np.full((H2, W2), 1.0, np.float32)
    depth[30:35, 58:63] = 0.0
    is_occupied = make_occupancy_checker(
        get_depth=lambda: depth, get_camera_xy=lambda: (0.0, 0.0),
        get_base_height=lambda: 0.0, resolution=(W2, H2), aperture=APERTURE)
    assert is_occupied(2.0, 0.0)
    assert not is_occupied(0.0, 0.0)
    assert is_occupied(100.0, 0.0)  # off-map


def test_free_map_height_bands():
    depth = np.array([[0.0, 0.3, 0.55, 0.7, 12.0]], np.float32)
    # h1 @ base 0: free = [0.6, 9.55) or (0.02, 0.5]
    free = free_map_from_topdown_depth(depth, base_height=0.0, robot_type="h1")
    np.testing.assert_array_equal(free, [[0, 1, 0, 1, 0]])
    # aliengo @ base 0.5, ankle 0.05: free = [0.5, 9.55)
    free = free_map_from_topdown_depth(depth, base_height=0.5,
                                       robot_type="aliengo",
                                       ankle_height=0.05)
    np.testing.assert_array_equal(free, [[0, 0, 1, 1, 0]])


def test_occupancy_checker_and_collision_controller():
    from internnav_tpu.env.controllers import FlashCollisionController

    # free everywhere (depth 1.0 is inside the h1 standing band), except
    # an obstacle patch at world (2, 0): px = W - (5*2 + W/2) = 40, py = 50
    depth = np.full((H, W), 1.0, np.float32)
    depth[38:43, 48:53] = 0.0  # 0.0 is outside every free band

    is_occupied = make_occupancy_checker(
        get_depth=lambda: depth,
        get_camera_xy=lambda: (0.0, 0.0),
        get_base_height=lambda: 0.0,
        resolution=(W, H),
        aperture=APERTURE,
    )
    assert is_occupied(2.0, 0.0)       # the obstacle
    assert not is_occupied(0.0, 0.0)   # open floor
    assert not is_occupied(-3.0, 1.0)
    assert is_occupied(50.0, 0.0)      # off the map -> occupied

    # wired into the teleport controller: a forward into the obstacle is
    # rejected (pose unchanged), a clear forward teleports
    ctrl = FlashCollisionController(is_occupied=is_occupied)
    blocked, _ = ctrl.apply(np.array([1.75, 0.0, 0.0]), 1)  # +0.25 -> (2,0)
    np.testing.assert_allclose(blocked, [1.75, 0.0, 0.0])
    moved, _ = ctrl.apply(np.array([0.0, 0.0, 0.0]), 1)
    np.testing.assert_allclose(moved, [0.25, 0.0, 0.0], atol=1e-9)
