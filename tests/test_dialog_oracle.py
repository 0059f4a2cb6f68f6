"""VLLN path-description oracle: parity vs the reference module + NPC
two-turn behavior + evaluator integration.

The reference (internnav/habitat_extensions/vlln/simple_npc/
get_description.py) needs matplotlib (available) and numpy-quaternion
(absent) — a minimal quaternion stub provides the two functions it uses,
so parity runs against the reference's actual code. Randomness is pinned
by patching np.random.choice to first-element in both modules.
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

from internnav_tpu.dialog import oracle

REF = "/root/reference/internnav/habitat_extensions/vlln/simple_npc/get_description.py"


@pytest.fixture(scope="module")
def ref_mod():
    mpl = pytest.importorskip("matplotlib")  # noqa: F841 — reference dep
    stub = types.ModuleType("quaternion")

    class _Q:
        def __init__(self, w, x, y, z):
            self.w, self.x, self.y, self.z = w, x, y, z

    def from_euler_angles(angles):
        # z-y-z convention; [0, yaw, 0] → pure rotation about +Y
        a, b, g = angles
        assert a == 0 and g == 0
        return _Q(np.cos(b / 2), 0.0, np.sin(b / 2), 0.0)

    def as_rotation_matrix(q):
        return oracle._rotation_matrix([q.w, q.x, q.y, q.z])

    stub.from_euler_angles = from_euler_angles
    stub.as_rotation_matrix = as_rotation_matrix
    stub.quaternion = _Q
    had = sys.modules.get("quaternion")
    sys.modules["quaternion"] = stub
    spec = importlib.util.spec_from_file_location("ref_get_description", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    if had is None:
        sys.modules.pop("quaternion", None)
    else:
        sys.modules["quaternion"] = had


@pytest.fixture
def first_choice(monkeypatch):
    monkeypatch.setattr(np.random, "choice", lambda seq: seq[0])
    return lambda seq: seq[0]


def _scene():
    """Two-room synthetic scene in habitat coordinates (x, up, z).

    Region polygons live in the ply ground plane (x, -z): living region
    covers z ∈ [-5, 0] (ply y ∈ [0, 5]), kitchen covers z ∈ [-10, -5].
    """
    region_dict = {
        "level0": [
            {"label": "living region", "id": 0,
             "poly": [[-5, 0], [5, 0], [5, 5], [-5, 5]],
             "enlarge_poly": [[-6, -1], [6, -1], [6, 6], [-6, 6]]},
            {"label": "cooking region", "id": 1,
             "poly": [[-5, 5], [5, 5], [5, 10], [-5, 10]],
             "enlarge_poly": [[-6, 4], [6, 4], [6, 11], [-6, 11]]},
        ]
    }
    object_dict = {
        "sofa_1": {"scope": "level0", "room": "living region",
                   "position": [1.0, 0.5, -2.0], "category": "sofa",
                   "unique_description": {"color": "Red", "texture": "",
                                          "material": "Fabric",
                                          "fine grained category": "couch"},
                   "nearby_objects": {"table_1": 1.0},
                   "caption": "a red fabric sofa"},
        "table_1": {"scope": "level0", "room": "living region",
                    "position": [-1.0, 0.4, -3.0], "category": "table",
                    "unique_description": {"color": "Brown", "texture": "",
                                           "material": "Wood",
                                           "fine grained category": "coffee table"},
                    "nearby_objects": {}, "caption": "a wooden table"},
        "fridge_1": {"scope": "level0", "room": "cooking region",
                     "position": [2.0, 0.9, -7.0], "category": "refrigerator",
                     "unique_description": {"color": "White", "texture": "",
                                            "material": "Metal",
                                            "fine grained category": "fridge"},
                     "nearby_objects": {}, "caption": "a white fridge"},
        "wall_1": {"scope": "level0", "room": "cooking region",
                   "position": [0.0, 1.5, -8.0], "category": "wall",
                   "unique_description": "", "nearby_objects": {},
                   "caption": ""},
    }
    # straight through the living room, right turn into the kitchen
    path = [np.asarray(p, np.float64) for p in [
        [0.0, 0.5, -1.0], [0.0, 0.5, -2.5], [0.0, 0.5, -4.0],
        [0.0, 0.5, -5.5], [1.2, 0.5, -6.5], [2.4, 0.5, -7.0],
    ]]
    return region_dict, object_dict, path


# ------------------------------------------------------------------ parity
def test_point_in_polygon_matches_matplotlib():
    mpl_path = pytest.importorskip("matplotlib.path")
    rng = np.random.default_rng(0)
    for _ in range(20):
        k = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        poly = np.stack([np.cos(ang), np.sin(ang)], 1) * rng.uniform(1, 3)
        pts = rng.uniform(-3, 3, (50, 2))
        # skip points near edges where matplotlib's tolerance differs
        mine = oracle.point_in_polygon(pts, poly)
        ref = mpl_path.Path(poly).contains_points(pts)
        shrink = mpl_path.Path(poly * 0.999).contains_points(pts / 1.001)
        stable = ref == shrink
        assert (mine == ref)[stable].all()


def test_sample_points_parity(ref_mod):
    rng = np.random.default_rng(1)
    pts = np.cumsum(rng.uniform(-0.5, 0.8, (40, 3)), axis=0)
    rooms = [f"r{i % 3}" for i in range(40)]
    assert oracle.sample_points(pts, rooms, 1.0) == ref_mod.sample_points(pts, rooms, 1.0)


def test_find_sharp_turns_parity(ref_mod):
    rng = np.random.default_rng(2)
    pts = np.cumsum(rng.uniform(-1, 1, (30, 3)), axis=0)  # habitat (x, up, z)
    permuted = pts @ np.asarray([[0, 1, 0], [0, 0, 1], [1, 0, 0]])
    ref_idx, ref_ang = ref_mod.find_sharp_turns(permuted, threshold=40)
    my_idx, my_ang = oracle.find_sharp_turns(pts, threshold=40, up_axis=1)
    np.testing.assert_array_equal(my_idx, ref_idx)
    np.testing.assert_allclose(my_ang, ref_ang, atol=1e-9)


def test_compute_yaw_rotation_parity(ref_mod):
    quat = sys.modules["quaternion"]
    for yaw in [0.0, 0.7, -1.2, 2.9]:
        for tgt in [[1, 0, -1], [-2, 0, -0.5], [0.3, 0, 2]]:
            ref = ref_mod.compute_yaw_rotation(
                quat.from_euler_angles([0, yaw, 0]), [0, 0, 0], tgt)
            mine = oracle.yaw_rotation_to(oracle.quat_from_yaw(yaw), [0, 0, 0], tgt)
            assert abs(ref - mine) < 1e-9
            assert abs(oracle.yaw_rotation_to(yaw, [0, 0, 0], tgt) - ref) < 1e-9


def test_rooms_and_objects_parity(ref_mod):
    region_dict, object_dict, path = _scene()
    ref_rooms = ref_mod.get_points_room(
        [p.copy() for p in path], region_dict, object_dict, "poly")
    my_rooms = oracle.SceneOracle(object_dict, region_dict).rooms_at(path, "poly")
    assert [sorted(r) for r in my_rooms] == [sorted(r) for r in ref_rooms]
    ref_objs = ref_mod.get_nearest_object(
        [p.copy() for p in path], region_dict, object_dict)
    my_objs = oracle.SceneOracle(object_dict, region_dict).nearest_objects(path)
    assert my_objs == ref_objs


def test_fill_and_minimize_parity(ref_mod):
    labels = ["", "a", "", "", "b", "", ""]
    assert oracle._fill_empty_with_nearest(labels) == ref_mod.fill_empty_with_nearest(labels)
    opts = [["a", "b"], [], ["b"], ["a", "c", "b"], ["c"]]
    assert oracle._minimize_unique_strings(opts) == ref_mod.minimize_unique_strings(opts)


def test_path_description_parity(ref_mod, first_choice):
    region_dict, object_dict, path = _scene()
    quat = sys.modules["quaternion"]
    yaw = 0.3
    heights = [0.5] * len(path)
    ref = ref_mod.get_path_description(
        quat.from_euler_angles([0, yaw, 0]), [p.copy() for p in path],
        object_dict, region_dict, height_list=heights)
    mine = oracle.describe_path(oracle.quat_from_yaw(yaw), path, object_dict,
                                region_dict, height_list=heights,
                                choice=first_choice)
    assert mine == ref
    assert "1." in mine and "turn" in mine.lower()


def test_path_description_plain_parity(ref_mod, first_choice):
    _, _, path = _scene()
    quat = sys.modules["quaternion"]
    # vary heights to exercise the stairs branch
    heights = [0.5, 0.5, 0.8, 1.1, 1.1, 1.1]
    ref = ref_mod.get_path_description_without_additional_info(
        quat.from_euler_angles([0, -0.9, 0]), [p.copy() for p in path],
        height_list=heights)
    mine = oracle.describe_path_plain(oracle.quat_from_yaw(-0.9), path,
                                      height_list=heights, choice=first_choice)
    assert mine == ref
    assert "stairs" in mine or "floor" in mine


def test_landmark_name_parity(ref_mod, first_choice):
    region_dict, object_dict, path = _scene()
    sc = oracle.SceneOracle(object_dict, region_dict)
    point_info = {"object": "fridge_1", "position": [2.0, 0.5, -7.2]}
    ref = ref_mod.get_object_name(point_info, object_dict)
    mine = sc.landmark_name(point_info["position"], "fridge_1", first_choice)
    assert mine == ref == "white refrigerator"


# ------------------------------------------------------------- NPC surface
def test_npc_two_turn_modes():
    from internnav_tpu.dialog.npc import DISAMBIGUATION_PROMPT, SimpleNPC

    _, object_dict, _ = _scene()
    npc = SimpleNPC()
    path_desc = "1. move forward along the direction from your current view,"
    # path question returns the oracle description verbatim
    out = npc.answer_question("Where should I go now?", "sofa_1", object_dict,
                              task_done=False, path_description=path_desc)
    assert out == path_desc
    # disambiguation draws from the yes/no pools by task_done
    yes = npc.answer_question("Is it the object you are looking for?", "sofa_1",
                              object_dict, True, path_desc)
    no = npc.answer_question("Is this the right place?", "sofa_1",
                             object_dict, False, path_desc)
    assert yes in DISAMBIGUATION_PROMPT["yes"] and no in DISAMBIGUATION_PROMPT["no"]
    # information questions answer from the goal annotation
    info = npc.answer_question("What is the color of the goal object?",
                               "sofa_1", object_dict, False, path_desc)
    assert "red" in info.lower()
    assert len(npc.history) == 4


def test_npc_goal_information_block():
    from internnav_tpu.dialog.npc import goal_information

    _, object_dict, _ = _scene()
    info = goal_information("sofa_1", object_dict)
    assert "room: living room" in info
    assert "color: red" in info
    assert "nearby objects: coffee table" in info
    assert "a red fabric sofa" in info


def test_npc_llm_classification_routes():
    from internnav_tpu.dialog.npc import SimpleNPC

    _, object_dict, _ = _scene()
    calls = []

    def llm(prompt):
        calls.append(prompt)
        if "classify" in prompt or "three types" in prompt:
            return "path"
        return "paraphrased answer"

    npc = SimpleNPC(llm_fn=llm)
    out = npc.answer_question("random words?", "sofa_1", object_dict, False,
                              "THE PATH")
    assert out == "THE PATH"  # llm classified as path
    assert any("three types" in c for c in calls)


# ------------------------------------------------------- evaluator wiring
def test_dialog_evaluator_oracle_answers():
    from internnav_tpu.configs import AgentCfg, EnvCfg, EvalCfg, TaskCfg
    from internnav_tpu.dialog.evaluator import HabitatDialogEvaluator
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.habitat.sim_adapter import FakeSim

    region_dict, object_dict, _ = _scene()
    # planar-frame episode: (x, y, h); oracle permutes to habitat (x, h, y)
    ref_path = np.asarray([[0, -1, 0.5], [0, -3, 0.5], [0, -5.5, 0.5],
                           [2.4, -7, 0.5]], np.float64)
    ep = Episode(
        episode_id="d0", trajectory_id="t0", scene_id="syn",
        instruction_text="find the fridge", instruction_tokens=None,
        start_position=np.asarray([0.0, -1.0, 0.5]),
        start_rotation=np.zeros(4), reference_path=ref_path,
        geodesic_distance=7.0, split="val_unseen",
        extra={"object_dict": object_dict, "region_dict": region_dict,
               "instance_id": "fridge_1",
               "goal_position": [2.4, -7.0, 0.5]})

    class AskingAgent:
        """Asks a path question on step 2, otherwise walks forward."""

        def __init__(self):
            self.npc = types.SimpleNamespace(reset=lambda *a, **k: None)
            self.seen_answers = []

        def reset(self, *a, **k):
            self.t = 0

        def step(self, obs):
            if obs[0].get("npc_answer"):
                self.seen_answers.append(obs[0]["npc_answer"])
            self.t += 1
            if self.t == 2:
                return [{"action": [4], "question": "Where should I go now?"}]
            return [{"action": [1 if self.t < 8 else 0]}]

    cfg = EvalCfg(agent=AgentCfg(model_name="dialog"),
                  env=EnvCfg(env_type="fake"), task=TaskCfg(max_step=12),
                  eval_type="habitat_dialog", output_dir="/tmp/dialog_oracle")
    agent = AskingAgent()
    ev = HabitatDialogEvaluator(cfg, sim=FakeSim(rgb_hw=(32, 32)),
                                episodes=[ep], agent=agent)
    recs = ev.eval_action()
    assert recs[0]["questions"] == 1.0
    assert recs[0]["dialogs"][0]["question"] == "Where should I go now?"
    answer = recs[0]["dialogs"][0]["answer"]
    # the oracle synthesized a numbered route description from annotations
    assert answer.startswith("1. ")
    assert agent.seen_answers == [answer]


def test_get_description_truncates_and_measures():
    from internnav_tpu.env.episodes import Episode
    from internnav_tpu.habitat.sim_adapter import FakeSim

    region_dict, object_dict, _ = _scene()
    ref_path = np.asarray([[0, -1, 0.5], [0, -3, 0.5], [0, -5.5, 0.5],
                           [2.4, -7, 0.5]], np.float64)
    ep = Episode(
        episode_id="d1", trajectory_id="t1", scene_id="syn",
        instruction_text="", instruction_tokens=None,
        start_position=np.asarray([0.0, -1.0, 0.5]),
        start_rotation=np.zeros(4), reference_path=ref_path,
        geodesic_distance=7.0,
        extra={"goal_position": [2.4, -7.0, 0.5]})
    sim = FakeSim(rgb_hw=(16, 16))
    sim.reset(ep)
    desc, pl = oracle.get_description(sim, ep, object_dict, region_dict,
                                      choice=lambda s: s[0])
    assert desc is not None and desc.startswith("1. ")
    assert pl > 6.0  # full remaining path length, not the truncated 4 m
