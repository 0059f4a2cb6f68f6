"""Regression tests for the round-4 review findings.

Each test pins a behavior that was observed wrong in review:
- dialog-oracle turn chirality for planar CCW sims (FakeSim) vs the
  habitat-convention adapter (the (x, y, h) -> (x, h, y) permutation is a
  mirror, so left/right labels need the sim's declared handedness);
- get_description's failure/degenerate-path semantics and the >= 4 m
  first-segment truncation;
- VLNPEBatchAdapter partial resets keeping live slots' real frames;
- SimpleNPC goal_information line structure;
- the batched agent's navdp System-1 submission ([memory, current] RGBD
  pairs with preprocessed depth).
"""

from __future__ import annotations

import types

import numpy as np

from internnav_tpu.dialog import oracle
from internnav_tpu.env.episodes import Episode


def _episode(path, goal=None):
    path = np.asarray(path, np.float64)
    return Episode(
        episode_id="c0", trajectory_id="t0", scene_id="syn",
        instruction_text="", instruction_tokens=None,
        start_position=path[0].copy(), start_rotation=np.zeros(4),
        reference_path=path, geodesic_distance=1.0,
        extra={"goal_position": list(goal if goal is not None else path[-1])})


# ------------------------------------------------------------- chirality
def test_fakesim_left_turn_is_described_left():
    """FakeSim is planar CCW (turn_left = yaw+); a path bending toward +y
    from a +x heading is a LEFT turn and must be phrased 'left'. Before the
    fix the (x, h, y) mirror flipped it to 'right'."""
    from internnav_tpu.habitat.sim_adapter import FakeSim

    ep = _episode([[0, 0, 0.5], [1.5, 0, 0.5], [1.5, 1.5, 0.5]])
    sim = FakeSim(rgb_hw=(16, 16))
    sim.reset(ep)  # yaw = 0: facing +x
    assert sim.planar_ccw is True
    # empty annotations -> describe_path raises -> plain fallback
    desc, pl = oracle.get_description(sim, ep, {}, {},
                                      choice=lambda s: s[0])
    assert desc is not None
    assert "left" in desc
    assert "right" not in desc


def test_habitat_convention_left_turn_is_described_left():
    """A habitat-backed adapter exposes planar (x_hab, z_hab) coords —
    LEFT-handed (habitat yaw+ about +y is CW in that plane) — and declares
    planar_ccw = False; a bend toward -z_hab from a +x_hab heading is a
    left turn and keeps the un-flipped label."""

    class HabStubSim:
        planar_ccw = False  # like HabitatSimAdapter
        position = np.asarray([0.0, 0.0, 0.5])
        heading = 0.0  # facing +x_hab

    ep = _episode([[0, 0, 0.5], [1.5, 0, 0.5], [1.5, -1.5, 0.5]])
    desc, pl = oracle.get_description(HabStubSim(), ep, {}, {},
                                      choice=lambda s: s[0])
    assert desc is not None
    assert "left" in desc
    assert "right" not in desc


# ------------------------------------------------- failure / truncation
def test_get_description_path_failure_is_unknown_not_done():
    """A failed path search returns pl=inf so `pl < 3` callers never read
    failure as arrival (the NPC used to answer 'yes, correct position')."""

    class NoPathSim:
        position = np.asarray([0.0, 0.0, 0.5])
        yaw = 0.0

        def find_path(self, start, end):
            return [], False

    ep = _episode([[0, 0, 0.5], [5, 0, 0.5]])
    desc, pl = oracle.get_description(NoPathSim(), ep, {}, {})
    assert desc is None
    assert pl == float("inf")


def test_get_description_at_goal_is_zero():
    """Degenerate single-point path (agent standing at the goal) keeps
    pl=0.0 — that IS arrival."""

    class AtGoalSim:
        position = np.asarray([0.0, 0.0, 0.5])
        yaw = 0.0

        def find_path(self, start, end):
            return [np.asarray([0.0, 0.0, 0.5])] * 2, True

    ep = _episode([[0, 0, 0.5], [0, 0, 0.5]])
    desc, pl = oracle.get_description(AtGoalSim(), ep, {}, {})
    assert desc is None
    assert pl == 0.0


def test_get_description_long_first_segment_describes_whole_path():
    """First hop >= 4 m: the reference describes the WHOLE remaining path
    (dialog_utils.py:59-60 sets goal_index = len(goal_path) - 1), so the
    later sharp bend IS narrated. (A round-4 fix truncated to one segment;
    reverted for parity — advisor r4 finding #3.)"""
    from internnav_tpu.habitat.sim_adapter import FakeSim

    # 5 m straight, then a sharp bend the whole-path description reaches
    ep = _episode([[0, 0, 0.5], [5, 0, 0.5], [5, 5, 0.5]])
    sim = FakeSim(rgb_hw=(16, 16))
    sim.reset(ep)
    desc, pl = oracle.get_description(sim, ep, {}, {},
                                      choice=lambda s: s[0])
    assert desc is not None
    assert pl > 9.0  # full remaining length still reported
    assert "left" in desc or "right" in desc  # bend narrated, not truncated


# ------------------------------------------------------- batch adapter
def test_partial_reset_keeps_live_frames(tmp_path):
    """reset(done_ids) must not replace live slots' frames with zero
    fills: live slots keep their last real capture, reset slots get a
    fresh side-effect-free render."""
    from internnav_tpu.configs.evaluator import EnvCfg, TaskCfg
    from internnav_tpu.env.internutopia.batch_adapter import VLNPEBatchAdapter
    from internnav_tpu.env.internutopia.env import InternutopiaEnv
    from tests.test_vlnpe import _episode as vlnpe_episode

    eps = [vlnpe_episode(i) for i in range(4)]
    env = InternutopiaEnv(
        EnvCfg(env_type="internutopia",
               env_settings={"backend": "fake_physics"}, env_num=2),
        TaskCfg(max_step=3, warm_up_step=1, robot_flash=True,
                camera_resolution=[24, 24]),
        episodes=eps)
    ad = VLNPEBatchAdapter(env, robot_name="h1", robot_flash=True,
                           episodes=eps, rgb_hw=(24, 24))
    obs = ad.reset()
    obs = ad.step([1, 1])  # both slots capture real frames
    live_rgb = np.asarray(obs[1]["rgb"])
    assert live_rgb.any(), "macro step must deliver a real capture"
    # slot 0 exhausts its step budget -> done -> re-reset it
    for _ in range(3):
        obs = ad.step([1, -1])
        if obs[0]["done"]:
            break
    assert obs[0]["done"]
    last_live = np.asarray(obs[1]["rgb"])
    obs2 = ad.reset([0])
    # the live slot's frame survives the partial reset
    assert np.array_equal(np.asarray(obs2[1]["rgb"]), last_live)
    assert np.asarray(obs2[1]["rgb"]).any()
    # the reset slot gets a real first render, not a zero frame
    assert np.asarray(obs2[0]["rgb"]).any()
    assert obs2[0]["done"] is False


# ------------------------------------------------------------------ NPC
def test_goal_information_line_structure():
    from internnav_tpu.dialog.npc import goal_information

    object_dict = {
        "sofa_1": {
            "room": "living region",
            "unique_description": {"color": "red",
                                   "fine grained category": "sofa"},
            "nearby_objects": {"table_1": 1.0},
            "caption": "a red fabric sofa",
        },
        "table_1": {
            "room": "living region",
            "unique_description": {"fine grained category": "coffee table"},
        },
    }
    out = goal_information("sofa_1", object_dict)
    lines = out.splitlines()
    assert "room: living room" in lines
    assert "color: red" in lines
    # byte-parity with the reference (simple_npc.py:78): "whole
    # description:" is concatenated with NO separator, so it glues onto
    # the previous line (advisor r4 finding #4 reverted the added \n)
    assert out.endswith(
        "nearby objects: coffee tablewhole description: a red fabric sofa")


def test_room_names_single_source():
    import internnav_tpu.dialog.npc as npc

    assert npc.ROOM_NAMES is oracle.ROOM_NAMES


# -------------------------------------------------- batched navdp agent
def test_batched_agent_submits_navdp_rgbd_pairs():
    """With a navdp System-1 config the batched agent assembles
    [memory, current] RGBD pairs (preprocessed depth) and ships them to
    s1_submit — it used to ship nextdit-form current-frames-only and die
    on the pairs assert."""
    from internnav_tpu.agent.internvla_n1_agent import BatchedInternVLAN1Agent
    from internnav_tpu.configs.agent import AgentCfg
    from internnav_tpu.model.utils.vln_utils import S1Output

    calls = {}

    class StubPolicy:
        cfg = types.SimpleNamespace(system1="navdp_async")

        def reset_slot(self, i, instruction):
            pass

        def s1_submit(self, rgb, latents, num_sample_trajs=32, depth=None,
                      **kw):
            calls["rgb"] = np.asarray(rgb)
            calls["depth"] = np.asarray(depth)
            calls["nst"] = num_sample_trajs
            return {"B": rgb.shape[0]}

        def s1_collect(self, handle):
            return [S1Output(idx=[1, 1], trajectory=np.zeros((2, 3)))
                    for _ in range(handle["B"])]

    cfg = AgentCfg(model_name="internvla_n1_batched",
                   model_settings={"batch_size": 2, "depth_scale": 10.0,
                                   "depth_clip_m": 5.0})
    agent = BatchedInternVLAN1Agent(cfg, policy=StubPolicy())
    agent.reset()
    # seed slot state: latent present, no queued actions -> S1 fires;
    # steps_since_s2=0 keeps S2 idle in partial_async mode
    mem = np.full((8, 8, 3), 7, np.uint8)
    for st in agent.states:
        st.latent = np.zeros((1, 4, 16), np.float32)
        st.memory_frame = mem
        st.steps_since_s2 = 0  # keep S2 idle (reset() forces it otherwise)
    obs = [{"rgb": np.full((8, 8, 3), i + 1, np.uint8),
            "depth": np.full((8, 8, 1), 0.3, np.float32)}
           for i in range(2)]
    out = agent.step(obs)
    assert len(out) == 2 and out[0]["action"] == [1]
    rgb = calls["rgb"]
    assert rgb.shape == (2, 2, 8, 8, 3)
    assert np.array_equal(rgb[0, 0], mem)          # memory frame
    assert np.array_equal(rgb[1, 1], obs[1]["rgb"])  # current frame
    depth = calls["depth"]
    assert depth.shape == (2, 2, 8, 8, 1)
    # depth x10 clamped at 5 m
    assert np.allclose(depth, 3.0)
