"""VLN-PE (Isaac/InternUtopia) layer tests: loco controller, the
substep/finish_action physics protocol, and the full evaluator FSM against
FakePhysicsVecEnv."""

import numpy as np
import pytest


def _episode(i: int, k: int = 3):
    from internnav_tpu.env.episodes import Episode

    rs = np.random.RandomState(i)
    steps = rs.uniform(0.4, 1.0, size=(k, 1)) * np.stack(
        [np.cos(th := rs.uniform(-1, 1, size=k)), np.sin(th)], axis=1)
    path = np.concatenate([np.zeros((1, 2)), np.cumsum(steps, axis=0)], axis=0)
    ref = np.concatenate([path, np.zeros((k + 1, 1))], axis=1)
    geo = float(np.linalg.norm(np.diff(path, axis=0), axis=1).sum())
    return Episode(
        episode_id=str(i), trajectory_id=str(100 + i), scene_id=f"s{i % 2}",
        instruction_text=f"episode {i} go", instruction_tokens=np.arange(5),
        start_position=ref[0], start_rotation=np.array([1.0, 0, 0, 0]),
        reference_path=ref, geodesic_distance=geo,
    )


def _specs(n: int, max_step: int = 5, warm_up: int = 3):
    from internnav_tpu.configs.evaluator import TaskCfg
    from internnav_tpu.env.task_gen import generate_vln_episodes

    cfg = TaskCfg(max_step=max_step, warm_up_step=warm_up, robot_flash=False)
    return generate_vln_episodes([_episode(i) for i in range(n)], cfg)


# ------------------------------------------------------------------- loco
def test_loco_obs_builder_dims_and_cadence():
    from internnav_tpu.env.internutopia.loco import (
        DEFAULT_DOF_POS,
        GYM2SIM,
        SIM2GYM,
        H1RobotState,
        H1SpeedController,
        POLICY_OBS_DIM,
    )

    # joint order adapters invert each other
    np.testing.assert_array_equal(np.arange(19)[SIM2GYM][GYM2SIM], np.arange(19))

    ctrl = H1SpeedController()
    quat = np.array([1.0, 0, 0, 0])
    state = H1RobotState(
        base_position=np.array([0.0, 0, 1.05]),
        torso_position=np.array([0.0, 0, 1.25]), torso_quat=quat,
        imu_quat=quat, imu_ang_vel=np.array([0.1, 0.0, 0.2]),
        joint_positions=DEFAULT_DOF_POS.copy(),
        joint_velocities=np.zeros(19, np.float32), ankle_height=0.1,
    )
    obs = ctrl.build_obs(state, (0.8, 0.0, 0.1))
    assert obs.shape == (POLICY_OBS_DIM,)
    # command scaling [2, 2, .25] at the head of the current frame
    np.testing.assert_allclose(obs[330:333], [1.6, 0.0, 0.025], atol=1e-6)
    # qpos - default = 0 at default pose
    np.testing.assert_allclose(obs[339:358], 0.0, atol=1e-6)

    # policy runs on tick 0, then repeats targets for apply_times=3 ticks
    t0 = ctrl.forward(state, 0.5, 0.0, 0.0)
    t1 = ctrl.forward(state, 0.5, 0.0, 0.0)
    t2 = ctrl.forward(state, 0.5, 0.0, 0.0)
    t3 = ctrl.forward(state, 0.5, 0.0, 0.0)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(t0, t2)
    np.testing.assert_array_equal(t0, t3)
    t4 = ctrl.forward(state, 0.5, 0.0, 0.0)  # re-infers (history changed)
    assert t4.shape == (19,)


def test_dynamic_height_samples_expand_and_query():
    from internnav_tpu.env.internutopia.loco import DynamicHeightSamples

    hs = DynamicHeightSamples()
    pts = np.array([[1.0, 1.0, 0.3], [2.0, 2.0, 0.7]])
    hs.set_heights(pts, robot_pos=np.array([1.5, 1.5, 0.0]))
    got = hs.get_heights(np.array([[1.0, 1.0], [2.0, 2.0]]))
    np.testing.assert_allclose(got, [0.3, 0.7])
    # expansion keeps old values
    hs.set_heights(np.array([[3.0, 1.0, 0.9]]), robot_pos=np.array([2.5, 1.5, 0.0]))
    got = hs.get_heights(np.array([[1.0, 1.0], [3.0, 1.0]]))
    np.testing.assert_allclose(got, [0.3, 0.9])
    # body points (within 0.5 m of the robot) are discarded
    hs2 = DynamicHeightSamples()
    hs2.set_heights(np.array([[0.1, 0.1, 5.0]]), robot_pos=np.zeros(3))
    assert hs2.height_map is None


# --------------------------------------------------------- physics protocol
def test_fake_physics_substep_protocol():
    from internnav_tpu.env.internutopia.vec_env import FakePhysicsVecEnv

    env = FakePhysicsVecEnv(_specs(1, warm_up=3), env_num=1)
    obs, infos = env.reset()
    assert infos[0].data["path_key"] == _specs(1)[0].path_key
    assert obs[0]["h1"]["finish_action"] is False

    # warm-up: stand_still ticks decrement warm_up_step; finishes on the 3rd
    still = [{"h1": {"stand_still": []}}]
    for tick in range(2):
        obs, _, _, _, _ = env.step(still)
        assert obs[0]["h1"]["finish_action"] is False
        assert "rgb" not in obs[0]["h1"]
    obs, _, _, _, _ = env.step(still)
    assert obs[0]["h1"]["finish_action"] is True
    assert obs[0]["h1"]["rgb"].shape[-1] == 3  # capture on finish

    # move_by_discrete forward: 50 substeps, obs only on the last
    fwd = [{"h1": {"move_by_discrete": [1]}}]
    start = obs[0]["h1"]["globalgps"].copy()
    for tick in range(49):
        obs, _, _, _, _ = env.step(fwd)
        assert obs[0]["h1"]["finish_action"] is False, tick
        assert "rgb" not in obs[0]["h1"]
    obs, _, _, _, _ = env.step(fwd)
    o = obs[0]["h1"]
    assert o["finish_action"] is True and "rgb" in o
    moved = np.linalg.norm(o["globalgps"][:2] - start[:2])
    np.testing.assert_allclose(moved, 0.25, atol=1e-6)  # exactly one step
    assert o["instruction"] == "episode 0 go"

    # stop: finishes immediately, no rgb, metrics with success/not_reach_goal
    obs, _, term, _, _ = env.step([{"h1": {"stop": []}}])
    o = obs[0]["h1"]
    assert o["finish_action"] is True and "rgb" not in o
    assert term[0] is True or o.get("metrics")
    m = o["metrics"]
    assert m["fail_reason"] in ("success", "not_reach_goal")
    assert "spl" in m and "NE" in m


def test_fake_physics_turn_angles():
    from internnav_tpu.env.internutopia.vec_env import FakePhysicsVecEnv

    env = FakePhysicsVecEnv(_specs(1, warm_up=1), env_num=1)
    env.reset()
    env.step([{"h1": {"stand_still": []}}])  # warm-up done (warm_up=1)
    left = [{"h1": {"move_by_discrete": [2]}}]
    for _ in range(50):
        obs, *_ = env.step(left)
    yaw = np.asarray(obs[0]["h1"]["globalrotation"])
    got = 2 * np.arctan2(yaw[3], yaw[0])
    np.testing.assert_allclose(np.degrees(got), 15.0, atol=1e-6)


def test_fake_physics_loco_path_runs():
    """use_loco=True drives the jitted MLP + 492-obs builder per tick."""
    from internnav_tpu.env.internutopia.vec_env import FakePhysicsVecEnv

    env = FakePhysicsVecEnv(_specs(1, max_step=50, warm_up=1), env_num=1,
                            use_loco=True)
    env.reset()
    env.step([{"h1": {"stand_still": []}}])
    for _ in range(8):
        env.step([{"h1": {"vln_move_by_speed": [0.5, 0.0, 0.0]}}])
    assert env.loco_calls == 8


# ------------------------------------------------------------ evaluator FSM
def _eval_cfg(tmp_path, n_eps: int, env_num: int = 2):
    from internnav_tpu.configs.agent import AgentCfg
    from internnav_tpu.configs.evaluator import EnvCfg, EvalCfg, TaskCfg

    return EvalCfg(
        agent=AgentCfg(model_name="simple",
                       model_settings={"mode": "random", "seed": 1}),
        env=EnvCfg(env_type="internutopia",
                   env_settings={"backend": "fake_physics"}, env_num=env_num),
        task=TaskCfg(max_step=4, warm_up_step=2, robot_flash=False,
                     camera_resolution=[32, 32]),
        eval_type="vln_pe",
        output_dir=str(tmp_path / "out"),
    )


def test_vlnpe_evaluator_full_fsm_and_resume(tmp_path):
    from internnav_tpu.evaluator import Evaluator, VLNPEEvaluator  # noqa: F401

    eps = [_episode(i) for i in range(5)]
    cfg = _eval_cfg(tmp_path, 5)
    ev = Evaluator.init(cfg, episodes=eps)
    metrics = ev.eval()
    assert metrics["num_episodes"] == 5
    assert 0.0 <= metrics["success"] <= 1.0

    # resume: run again — every episode is already in the store; the second
    # evaluator sees zero pending and reports the stored results
    ev2 = Evaluator.init(cfg, episodes=eps)
    metrics2 = ev2.eval()
    assert metrics2["num_episodes"] == 5
    assert metrics2["success"] == metrics["success"]


@pytest.mark.slow
def test_vlnpe_evaluator_with_process_pool(tmp_path):
    """Ray-equivalent distribution: proc_num=2 workers x env_num=2 envs each
    behind the same vec-env surface; the evaluator FSM is oblivious."""
    from internnav_tpu.configs.agent import AgentCfg
    from internnav_tpu.configs.evaluator import EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.evaluator import Evaluator

    eps = [_episode(i) for i in range(6)]
    cfg = EvalCfg(
        agent=AgentCfg(model_name="simple",
                       model_settings={"mode": "random", "seed": 3}),
        env=EnvCfg(env_type="internutopia",
                   env_settings={"backend": "fake_physics",
                                 "distribution_config": {"proc_num": 2}},
                   env_num=2),
        task=TaskCfg(max_step=4, warm_up_step=2, robot_flash=False,
                     camera_resolution=[32, 32]),
        eval_type="vln_pe",
        output_dir=str(tmp_path / "out"),
    )
    ev = Evaluator.init(cfg, episodes=eps)
    assert ev.env_num == 4  # 2 procs x 2 envs
    metrics = ev.eval()
    assert metrics["num_episodes"] == 6
    ev.env.close()


def test_vln_default_get_config_assembly():
    """The defaults-merging VLN-PE config assembly (reference
    vln_default_config.get_config :180-328): h1 robot with loco/stand/
    discrete/flash controllers, camera + pointcloud sensors, scene scale
    switch, model-settings defaults, None-leaf validation."""
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, SceneCfg, TaskCfg
    from internnav_tpu.configs.vln_default import get_config, validate_eval_config

    from internnav_tpu.configs import EvalDatasetCfg

    cfg = EvalCfg(
        agent=AgentCfg(model_name="cma", model_settings={"num_actions": 4}),
        env=EnvCfg(env_type="internutopia", proc_num=4),
        task=TaskCfg(robot_name="h1", robot_flash=True,
                     scene=SceneCfg(scene_type="kujiale",
                                    scene_data_dir="data/scenes")),
        dataset=EvalDatasetCfg(base_data_dir="data/vln_pe/raw_data/r2r"),
        eval_type="vln_pe",
    )
    full = get_config(cfg)
    names = [c.name for c in full.task.robot.controllers]
    assert names == ["vln_move_by_speed", "stand_still", "move_by_discrete",
                     "move_by_flash"]
    assert [s.name for s in full.task.robot.sensors] == [
        "pano_camera_0", "topdown_camera_500", "tp_pointcloud"]
    assert full.task.scene.scene_scale == [0.01, 0.01, 0.01]  # kujiale 1:100
    assert full.task.robot.ankle_height == 0.0758
    # user model_settings override the per-model defaults
    assert full.agent.model_settings["num_actions"] == 4
    assert "state_encoder" in full.agent.model_settings
    # proc_num wires the sim process pool
    assert full.env.env_settings["distribution_config"]["proc_num"] == 4
    assert full.env.env_settings["sim_settings"]["physics_dt"] == 1 / 200

    # validation rejects None leaves
    import pytest as _pytest

    bad = full.model_copy(deep=True)
    bad.task.robot_usd_path = None
    with _pytest.raises(ValueError, match="robot_usd_path"):
        validate_eval_config(bad)


def test_internutopia_import_guard():
    """The Isaac backend raises the reference's RuntimeError without
    InternUtopia; isaac_ext imports cleanly everywhere."""
    import internnav_tpu.env.internutopia.isaac_ext as ext
    from internnav_tpu.configs.evaluator import EnvCfg, TaskCfg
    from internnav_tpu.env.internutopia.env import InternutopiaEnv

    spec = _specs(1)[0]
    cfg_dict = ext.task_cfg_from_spec(spec)
    assert cfg_dict["type"] == "VLNEvalTask"
    assert cfg_dict["data"]["path_key"] == spec.path_key

    with pytest.raises(RuntimeError, match="InternUtopia"):
        ext.register()

    with pytest.raises(RuntimeError, match="InternUtopia"):
        InternutopiaEnv(
            EnvCfg(env_type="internutopia", env_settings={}),
            TaskCfg(), episodes=[_episode(0)],
        )
