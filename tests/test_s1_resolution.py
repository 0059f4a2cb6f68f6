"""System-1 frame-resolution handling (round-5 realworld e2e fix).

The S1 DinoViT pos embeds are resolution-fixed; the reference agent
resizes every S1 memory/current frame to 224x224 before the head
(reference internnav/agent/internvla_n1_agent.py:310-319). Our policy
records the canonical S1 resolution (cfg.s1_image_hw on the flagship,
inferred from the loaded pos_embed otherwise) and host-resizes frames
only on a genuine patch-grid mismatch, so tiny test policies keep
feeding their native frames bit-unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest

from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
from internnav_tpu.model.basemodel.internvla_n1 import policy as policy_mod
from internnav_tpu.model.basemodel.internvla_n1.policy import (
    InternVLAN1Policy,
    _infer_s1_hw,
    _resize_frames,
)


@pytest.fixture(scope="module")
def tiny_policy():
    return InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit_async"),
                                   image_hw=56)


def test_flagship_config_pins_224():
    cfg = InternVLAN1Config.qwen25vl_7b("nextdit_async")
    assert cfg.s1_image_hw == 224


def test_infer_from_pos_embed(tiny_policy):
    # built at 56 -> SAME-conv grid ceil(56/14)=4 -> 17 pos tokens -> 56
    assert _infer_s1_hw(tiny_policy.params) == 56
    assert tiny_policy.s1_image_hw == 56


def test_resize_frames_shapes_and_dtype():
    rgb = np.random.RandomState(0).randint(
        0, 255, (1, 2, 224, 224, 3)).astype(np.uint8)
    out = _resize_frames(rgb, 56)
    assert out.shape == (1, 2, 56, 56, 3) and out.dtype == np.uint8
    depth = np.random.RandomState(1).rand(1, 2, 224, 224, 1).astype(np.float32)
    dout = _resize_frames(depth, 56)
    assert dout.shape == (1, 2, 56, 56, 1) and dout.dtype == np.float32
    # no-op path returns the input array untouched
    assert _resize_frames(out, 56) is out


def test_s1_step_accepts_any_camera_resolution(tiny_policy):
    """The realworld server posts raw camera frames (the original repro:
    224x224 frames into a 56-built tiny policy crashed on the pos_embed
    shape). s1_step_latent must resize and run."""
    pol = tiny_policy
    rs = np.random.RandomState(0)
    latent = np.asarray(rs.randn(
        1, pol.cfg.n_query, pol.cfg.text.hidden_size).astype(np.float32))
    rgb = rs.randint(0, 255, (1, 2, 224, 224, 3)).astype(np.uint8)
    out = pol.s1_step_latent(rgb, None, latent, continuous_traj=True)
    assert out.trajectory is not None


def test_s1_step_grid_match_does_not_resize(tiny_policy, monkeypatch):
    """Frames whose SAME-conv grid already matches the pos embeds pass
    through bit-unchanged (keeps single-stream vs batched-serving parity
    for tiny test configs that feed native-resolution frames)."""
    pol = tiny_policy
    calls = []

    def spy(frames, hw):
        calls.append(np.asarray(frames).shape)
        return _resize_frames(frames, hw)

    monkeypatch.setattr(policy_mod, "_resize_frames", spy)
    rs = np.random.RandomState(0)
    latent = np.asarray(rs.randn(
        1, pol.cfg.n_query, pol.cfg.text.hidden_size).astype(np.float32))
    rgb = rs.randint(0, 255, (1, 2, 56, 56, 3)).astype(np.uint8)
    pol.s1_step_latent(rgb, None, latent, continuous_traj=True)
    assert calls == []  # grid 4 == pos-embed grid 4 -> no resize
    rgb224 = rs.randint(0, 255, (1, 2, 224, 224, 3)).astype(np.uint8)
    pol.s1_step_latent(rgb224, None, latent, continuous_traj=True)
    assert calls and calls[0] == (1, 2, 224, 224, 3)
