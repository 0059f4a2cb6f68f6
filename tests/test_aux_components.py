"""Aux subsystem tests: planners, visualization, result logger, checkers,
controllers, NPC, habitat measures + dual-system evaluator on FakeSim."""

import numpy as np
import pytest

from internnav_tpu.dialog.npc import SimpleNPC
from internnav_tpu.env.checkers import DoneChecker, StuckChecker, check_robot_fall
from internnav_tpu.evaluator.utils.planners import (
    AStarDiscretePlanner,
    AStarPlanner,
    inflate_obstacles,
)
from internnav_tpu.evaluator.utils.result_logger import ResultLogger
from internnav_tpu.evaluator.utils.data_collector import EpisodeResultStore
from internnav_tpu.habitat.measures import compute_all
from internnav_tpu.realworld.controllers import MPCController, PIDController


def test_astar_continuous_plans_around_wall():
    occ = np.zeros((40, 40), bool)
    occ[10:30, 20] = True  # vertical wall with gaps at top/bottom
    p = AStarPlanner(occ, origin=(0, 0), resolution=0.1)
    path = p.plan((1.0, 1.0), (1.0, 3.0))
    assert path is not None
    # path must not cross the wall cells
    for xy in path:
        i, j = int(round(xy[0] / 0.1)), int(round(xy[1] / 0.1))
        assert not occ[i, j]
    # unreachable goal → None
    occ2 = np.zeros((10, 10), bool)
    occ2[4:7, :] = True
    p2 = AStarPlanner(occ2, resolution=0.1)
    assert p2.plan((0.1, 0.1), (0.9, 0.9)) is None


def test_astar_discrete_reaches_goal():
    occ = np.zeros((40, 40), bool)
    p = AStarDiscretePlanner(occ, resolution=0.1, step_m=0.25)
    plan = p.plan((1.0, 1.0), 0.0, (2.0, 1.0))
    assert plan is not None and 1 in plan
    # simulate the plan kinematically
    x, y, yaw = 1.0, 1.0, 0.0
    for a in plan:
        if a == 1:
            x += 0.25 * np.cos(yaw)
            y += 0.25 * np.sin(yaw)
        elif a == 2:
            yaw += np.deg2rad(15)
        elif a == 3:
            yaw -= np.deg2rad(15)
    assert np.hypot(x - 2.0, y - 1.0) <= 0.3


def test_inflate_obstacles():
    occ = np.zeros((9, 9), bool)
    occ[4, 4] = True
    out = inflate_obstacles(occ, 2)
    assert out[4, 6] and out[6, 4] and not out[4, 7]


def test_checkers():
    stuck = StuckChecker(window=5)
    stuck.reset(np.zeros(3), 0.0)
    for _ in range(4):
        assert not stuck.update(np.zeros(3), 0.0)
    assert stuck.update(np.zeros(3), 0.0)  # 5th stationary update
    stuck.reset(np.zeros(3), 0.0)
    assert not stuck.update(np.asarray([1.0, 0, 0]), 0.0)  # moved → reset

    assert check_robot_fall([0, 0, 0.2], [1, 0, 0, 0])  # below height
    assert not check_robot_fall([0, 0, 1.0], [1, 0, 0, 0])
    # heavy tilt (90° roll quaternion)
    assert check_robot_fall([0, 0, 1.0], [0.707, 0.707, 0, 0])

    done = DoneChecker(max_step=3, stuck_window=100)
    done.reset()
    assert done.update(1, [0, 0, 1]) == (False, "")
    assert done.update(0, [0, 0, 1]) == (True, "")
    done.reset()
    for _ in range(2):
        done.update(1, [0, 0, 1])
    assert done.update(1, [0, 0, 1]) == (True, "exceed_max_step")


def test_pid_and_mpc_track_waypoint():
    pid = PIDController()
    v, w = pid.step((0, 0, 0), (1.0, 0.0))
    assert v > 0 and abs(w) < 0.1  # straight ahead
    v, w = pid.step((0, 0, 0), (0.0, 1.0))
    assert w > 0.5  # target to the left

    mpc = MPCController(horizon=6)
    ref = np.stack([np.linspace(0.2, 1.2, 6), np.zeros(6)], 1)
    v, w = mpc.step((0, 0, 0), ref)
    assert v > 0.05 and abs(w) < 0.3
    # follow the reference for a few steps: should approach it
    pose = np.asarray([0.0, 0.3, 0.0])
    for _ in range(10):
        v, w = mpc.step(pose, ref)
        pose[0] += v * np.cos(pose[2]) * mpc.dt
        pose[1] += v * np.sin(pose[2]) * mpc.dt
        pose[2] += w * mpc.dt
    assert abs(pose[1]) < 0.3


def test_simple_npc_answers():
    npc = SimpleNPC({"object": "red chair", "room": "kitchen", "floor": 1,
                     "nearby": ["table"], "position": [5.0, 0.0, 0.0]},
                    max_questions=2)
    assert "kitchen" in npc.answer("which room is it in?")
    assert "floor 1" in npc.answer("what floor?")
    assert "cannot answer" in npc.answer("more?")
    npc.reset()
    a = npc.answer("how far is it?", agent_position=[0.0, 0.0, 0.0])
    assert "meters" in a


def test_habitat_measures():
    ref = np.asarray([[0, 0, 0], [2, 0, 0], [4, 0, 0]], float)
    traj = np.asarray([[0, 0, 0], [1, 0, 0], [2, 0.5, 0], [3.8, 0.2, 0]], float)
    m = compute_all(traj, ref)
    assert m["success"] == 1.0 and 0 < m["spl"] <= 1.0
    assert m["TL"] > 3.5 and m["NE"] < 0.5
    assert 0 < m["ndtw"] <= 1.0


def test_result_logger_aggregates(tmp_path):
    store = EpisodeResultStore(str(tmp_path), rank=0)
    store.save_eval_result("a", info={"episode_id": "a", "split": "val_unseen",
                                      "success": 1.0, "spl": 0.8, "osr": 1.0,
                                      "NE": 1.0, "TL": 5.0, "ndtw": 0.9, "steps": 10})
    store2 = EpisodeResultStore(str(tmp_path), rank=1)
    store2.save_eval_result("b", info={"episode_id": "b", "split": "val_unseen",
                                       "success": 0.0, "spl": 0.0, "osr": 0.0,
                                       "NE": 6.0, "TL": 8.0, "ndtw": 0.4, "steps": 20})
    rl = ResultLogger(str(tmp_path))
    agg = rl.report()
    assert agg["val_unseen"]["success"] == 0.5
    assert agg["val_unseen"]["num_episodes"] == 2
    assert (tmp_path / "aggregate_result.txt").exists()


def test_visualize_util(tmp_path):
    from internnav_tpu.evaluator.utils.visualize import VisualizeUtil

    vu = VisualizeUtil(str(tmp_path), fps=5)
    for t in range(4):
        vu.add_step("ep0", {"rgb": np.zeros((64, 64, 3), np.uint8)}, action=1)
    out = vu.save_trajectory("ep0", reference_path=[[0, 0], [1, 0]],
                             trajectory=[[0, 0], [0.5, 0]])
    assert out is not None
    import os

    assert os.path.exists(str(tmp_path / "ep0" / "0000.png"))
    assert os.path.exists(str(tmp_path / "ep0" / "map.png"))


@pytest.mark.slow
def test_habitat_dual_system_evaluator_on_fakesim(tmp_path):
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.habitat.evaluator import HabitatVLNEvaluator
    from internnav_tpu.habitat.sim_adapter import FakeSim
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

    eps = [Episode(
        episode_id="0", trajectory_id="t", scene_id="s",
        instruction_text="go forward", instruction_tokens=None,
        start_position=np.zeros(3), start_rotation=np.asarray([1, 0, 0, 0]),
        reference_path=np.asarray([[0, 0, 0], [1, 0, 0]], float),
        geodesic_distance=1.0,
    )]
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit_async"))
    cfg = EvalCfg(agent=AgentCfg(model_name="simple"),
                  env=EnvCfg(env_type="fake"), task=TaskCfg(max_step=6),
                  eval_type="habitat_vln", output_dir=str(tmp_path),
                  eval_settings={"mode": "dual_system"})
    ev = HabitatVLNEvaluator(cfg, sim=FakeSim(rgb_hw=(56, 56), max_steps=10),
                             episodes=eps, policy=pol)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 1
    # resume: second run appends nothing new but reports the stored episode
    ev2 = HabitatVLNEvaluator(cfg, sim=FakeSim(rgb_hw=(56, 56)), episodes=eps,
                              policy=pol)
    m2 = ev2.eval()
    assert m2["num_episodes"] == 1


def test_controllers():
    from internnav_tpu.env.controllers import (
        DiscreteSpeedController,
        FlashCollisionController,
        FlashController,
        build_controller,
    )

    flash = FlashController()
    pose, done = flash.apply(np.zeros(3), 1)
    np.testing.assert_allclose(pose, [0.25, 0, 0], atol=1e-9)
    assert done

    # speed controller integrates to the same macro displacement
    speed = DiscreteSpeedController()
    pose2, done = speed.apply(np.zeros(3), 1)
    np.testing.assert_allclose(pose2, [0.25, 0, 0], atol=1e-6)
    pose3, _ = speed.apply(np.zeros(3), 2)
    np.testing.assert_allclose(np.rad2deg(pose3[2]), 15.0, atol=1e-6)

    # collision controller rejects blocked moves
    blocked = FlashCollisionController(is_occupied=lambda x, y: x > 0.1)
    pose4, _ = blocked.apply(np.zeros(3), 1)
    np.testing.assert_allclose(pose4, np.zeros(3))

    assert isinstance(build_controller("stand_still").apply(np.zeros(3))[0],
                      np.ndarray)


def test_trajectory_to_vw_is_frame_correct():
    """trajectory_to_vw takes a ROBOT-frame path and must drive forward
    regardless of where the robot sits in the odom frame — before the
    frame fix it steered toward odom (0,0)."""
    from internnav_tpu.realworld.controllers import (
        MPCController,
        trajectory_to_vw,
    )

    fwd = np.cumsum(np.full((4, 2), [0.25, 0.0]), axis=0)  # straight ahead
    poses = [(0.0, 0.0, 0.0),
             (5.0, -3.0, 0.0),           # far from origin, facing +x
             (5.0, -3.0, np.pi / 2),     # far from origin, facing +y
             (-2.0, 7.0, np.pi)]         # facing -x
    for pose in poses:
        v, w = trajectory_to_vw(fwd, pose, MPCController())
        assert v > 0.05, (pose, v, w)        # forward, not back to origin
        assert abs(w) < 0.2, (pose, v, w)    # straight path -> little turn


@pytest.mark.slow
def test_dialog_evaluator(tmp_path):
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.dialog.evaluator import HabitatDialogEvaluator
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.habitat.sim_adapter import FakeSim

    eps = [Episode(
        episode_id="0", trajectory_id="t", scene_id="s",
        instruction_text="find the chair", instruction_tokens=None,
        start_position=np.zeros(3), start_rotation=np.asarray([1, 0, 0, 0]),
        reference_path=np.asarray([[0, 0, 0], [1, 0, 0]], float),
        geodesic_distance=1.0,
        extra={"goal_info": {"object": "chair", "room": "kitchen"}},
    )]
    cfg = EvalCfg(
        agent=AgentCfg(model_name="dialog",
                       model_settings={"goal_info": {"object": "chair"}}),
        env=EnvCfg(env_type="fake"), task=TaskCfg(max_step=5),
        eval_type="habitat_dialog", output_dir=str(tmp_path),
    )
    ev = HabitatDialogEvaluator(cfg, sim=FakeSim(rgb_hw=(56, 56), max_steps=8),
                                episodes=eps)
    m = ev.eval()
    assert m["num_episodes"] == 1


def test_system2_prefers_navmesh_follower(tmp_path):
    """When the sim provides the navmesh protocol (snap_point +
    follow_toward — reference pathfinder.snap_point + ShortestPathFollower,
    habitat_vln_evaluator.py:663,804-830), system2 mode must route plans
    through it instead of the greedy kinematic fallback."""
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.habitat.evaluator import HabitatVLNEvaluator
    from internnav_tpu.habitat.sim_adapter import NavmeshFakeSim
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

    eps = [Episode(
        episode_id="nav0", trajectory_id="t", scene_id="s",
        instruction_text="go to 30 40 then stop", instruction_tokens=None,
        start_position=np.zeros(3), start_rotation=np.asarray([1, 0, 0, 0]),
        reference_path=np.asarray([[0, 0, 0], [2, 0, 0], [2, 2, 0]], float),
        geodesic_distance=4.0,
    )]
    sim = NavmeshFakeSim(rgb_hw=(56, 56), max_steps=12)
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit_async"))
    cfg = EvalCfg(agent=AgentCfg(model_name="simple"),
                  env=EnvCfg(env_type="fake"), task=TaskCfg(max_step=8),
                  eval_type="habitat_vln", output_dir=str(tmp_path),
                  eval_settings={"mode": "system2"})
    ev = HabitatVLNEvaluator(cfg, sim=sim, episodes=eps, policy=pol)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 1
    # the tiny random policy emits SOME plan; whenever it emitted a pixel
    # goal the navmesh follower must have been used
    if sim.follow_calls:
        assert sim.snap_calls >= sim.follow_calls
    # deterministic routing check: _follower_action must go through the
    # sim's navmesh follower, not the greedy fallback
    sim.reset(eps[0])
    before = sim.follow_calls
    a = ev._follower_action(np.asarray([5.0, 0.0]))
    assert sim.follow_calls == before + 1
    assert a in (0, 1, 2, 3)

    # snap_point projects onto the walkable polyline
    sim.reset(eps[0])
    snapped = sim.snap_point(np.asarray([1.0, 5.0]))
    np.testing.assert_allclose(snapped, [2.0, 2.0], atol=1e-6)
    snapped2 = sim.snap_point(np.asarray([1.0, -3.0]))
    np.testing.assert_allclose(snapped2, [1.0, 0.0], atol=1e-6)
