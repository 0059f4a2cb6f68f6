"""MP3D GT perception (dialog stack) tests: hole filling + 3D bbox → mask
projection roundtrip."""

import numpy as np


def test_fill_small_holes():
    from internnav_tpu.dialog.mp3d import fill_small_holes

    depth = np.ones((32, 32), np.float32)
    depth[4:6, 4:6] = 0      # small hole (4 px) — filled
    depth[10:26, 10:26] = 0  # big hole (256 px) — kept
    out = fill_small_holes(depth, area_thresh=50)
    assert out[5, 5] == 1.0
    assert out[18, 18] == 0.0


def test_mp3d_gt_perception_bbox_projection():
    from internnav_tpu.dialog.mp3d import MP3DGTPerception

    H, W = 48, 64
    fx = fy = 40.0
    max_d, min_d = 5.0, 0.0
    # flat wall at 2 m
    depth = np.full((H, W), 2.0 / max_d, np.float32)
    tf = np.eye(4)  # camera frame == world frame

    # a box covering world x in [0.2, 1.0] at z≈2 → right half of the image
    targets = np.array([[0.2, -10, 1.5, 1.0, 10, 2.5]])
    per = MP3DGTPerception(max_d, min_d, fx, fy)
    masks = per.predict(depth, targets, tf, area_threshold=4)
    assert masks.shape == (1, H, W)
    # pixel u maps to x = (u - W/2) * z / fx; x in [0.2, 1] → u in [36, 52]
    assert masks[0, H // 2, 40] == 1
    assert masks[0, H // 2, 20] == 0  # left half outside the box
    # empty target list → one all-zero mask
    empty = per.predict(depth, np.zeros((0, 6)), tf)
    assert empty.shape == (1, H, W) and empty.sum() == 0
