"""Core substrate tests: registry, configs, batching, geometry."""

import numpy as np
import pytest

from internnav_tpu.configs import (
    AgentCfg,
    EvalCfg,
    ExpCfg,
    ModelCfg,
    merge_defaults,
    validate_eval_config,
)
from internnav_tpu.utils import Registry, batch_obs, unbatch_obs
from internnav_tpu.utils.geometry import (
    compute_actions,
    get_delta,
    quat_to_euler_angles,
    euler_to_quat,
    to_local_coords,
    undo_delta,
)


def test_registry_roundtrip():
    reg = Registry("thing")

    @reg.register("a")
    class A:
        pass

    assert reg.get("a") is A
    assert "a" in reg
    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(ValueError):

        @reg.register("a")
        class B:
            pass


def test_eval_cfg_defaults_merge():
    cfg = EvalCfg(agent=AgentCfg(model_name="cma"), use_agent_server=False)
    merged = merge_defaults(cfg, {"task": {"max_step": 150}, "seed": 7})
    assert merged.task.max_step == 150
    assert merged.agent.model_name == "cma"
    # cfg wins over defaults
    merged2 = merge_defaults(EvalCfg(seed=3), {"seed": 7})
    assert merged2.seed == 3


def test_validate_eval_config():
    cfg = EvalCfg()
    validate_eval_config(cfg, ["agent.model_name", "task.max_step"])
    cfg2 = EvalCfg()
    cfg2.dataset.base_data_dir = None
    with pytest.raises(ValueError):
        validate_eval_config(cfg2, ["dataset.base_data_dir"])


def test_model_cfg_surface():
    m = ModelCfg(policy_name="cma")
    assert m.state_encoder.rnn_type == "GRU"
    assert m.num_actions == 4
    e = ExpCfg(model_name="cma")
    assert e.il.batch_size > 0
    assert e.mesh.axes == {"dp": -1}


def test_batch_obs_roundtrip():
    obs = [
        {"rgb": np.zeros((4, 4, 3), np.uint8), "gps": np.array([1.0, 2.0]), "instr": "go left"},
        {"rgb": np.ones((4, 4, 3), np.uint8), "gps": np.array([3.0, 4.0]), "instr": "go right"},
    ]
    b = batch_obs(obs)
    assert b["rgb"].shape == (2, 4, 4, 3)
    assert b["instr"] == ["go left", "go right"]
    back = unbatch_obs(b, 1)
    assert back["instr"] == "go right"
    np.testing.assert_array_equal(back["gps"], [3.0, 4.0])


def test_geometry_local_coords():
    pos = np.array([[1.0, 0.0], [2.0, 0.0]])
    local = to_local_coords(pos, np.array([1.0, 0.0]), np.pi / 2)
    # point directly ahead along +x, robot facing +y: appears at local (0, -1)
    np.testing.assert_allclose(local[1], [0.0, -1.0], atol=1e-9)


def test_compute_actions_padding_and_delta():
    T = 5
    positions = np.stack([np.arange(T, dtype=float), np.zeros(T)], axis=1)
    yaws = np.zeros(T)
    acts = compute_actions(positions, yaws, curr_index=3, horizon=4, learn_angle=False)
    assert acts.shape == (4, 2)
    # past the end, the last pose repeats
    np.testing.assert_allclose(acts[-1], acts[1], atol=1e-6)
    deltas = get_delta(acts)
    np.testing.assert_allclose(undo_delta(deltas), acts, atol=1e-6)


def test_quat_euler_roundtrip():
    q = euler_to_quat(0.1, -0.2, 0.7)
    e = quat_to_euler_angles(q)
    np.testing.assert_allclose(e, [0.1, -0.2, 0.7], atol=1e-9)


def test_task_gen(tmp_path):
    from internnav_tpu.configs import TaskCfg
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.env.task_gen import generate_vln_episodes, load_scene_asset

    eps = [Episode(
        episode_id="1", trajectory_id="t1", scene_id="sceneA",
        instruction_text="", instruction_tokens=None,
        start_position=np.asarray([1.0, 2.0, 0.0]),
        start_rotation=np.asarray([1.0, 0, 0, 0]),
        reference_path=np.zeros((2, 3)), geodesic_distance=1.0,
    )]
    # no scene dir → spec without asset
    specs = generate_vln_episodes(eps, TaskCfg(max_step=50))
    assert len(specs) == 1 and specs[0].max_step == 50
    np.testing.assert_allclose(specs[0].start_position, [1.0, 2.0, 0.0])

    # scene resolution walks for fixed assets; missing scene → skipped
    scene_dir = tmp_path / "sceneA" / "sub"
    scene_dir.mkdir(parents=True)
    (scene_dir / "fixed.usd").write_text("")
    assert load_scene_asset(str(tmp_path), "sceneA").endswith("fixed.usd")
    specs2 = generate_vln_episodes(eps, TaskCfg(), scene_data_dir=str(tmp_path))
    assert specs2[0].scene_asset.endswith("fixed.usd")
    eps[0].scene_id = "missing"
    assert generate_vln_episodes(eps, TaskCfg(), scene_data_dir=str(tmp_path)) == []
