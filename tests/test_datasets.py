"""Dataset pipeline tests: stores, sampling, collation, packing."""

import numpy as np
import pytest

from internnav_tpu.dataset.base import Prefetcher, inflection_weights
from internnav_tpu.dataset.internvla_n1_dataset import (
    N1SampleDataset,
    n1_collate_fn,
    n1_packed_collate_fn,
    relative_traj,
    tokenize_sample,
    write_synthetic_n1_dataset,
    IGNORE_INDEX,
)
from internnav_tpu.dataset.rdp_dataset import (
    make_rdp_dataloader,
    write_synthetic_rdp_dataset,
)
from internnav_tpu.dataset.vln_dataset import (
    VLNSampleDataset,
    cma_collate_fn,
    make_vln_dataloader,
    write_synthetic_dataset,
)


def test_inflection_weights():
    w = inflection_weights(np.asarray([1, 1, 2, 2, 2, 0]), coef=3.2)
    np.testing.assert_allclose(w, [3.2, 1, 3.2, 1, 1, 3.2])


def test_vln_dataset_and_collate(tmp_path):
    path = write_synthetic_dataset(str(tmp_path / "store.bin"), n_episodes=5, T=10, hw=32)
    make_epoch = make_vln_dataloader(path, batch_size=2, instr_pad_len=50)
    batches = list(make_epoch())
    assert len(batches) == 2  # 5 episodes, batch 2, drop_last
    b = batches[0]
    T, N = b["corrected_actions"].shape
    assert N == 2
    assert b["observations"]["rgb"].shape[:2] == (T, N)
    assert b["observations"]["instruction"].shape == (T, N, 50)
    assert (b["masks"][0] == 0).all()  # episode start
    # padding steps have zero weight
    lengths = (b["weights"] > 0).sum(0)
    assert (lengths <= T).all() and (lengths > 0).all()


def test_vln_rank_sharding(tmp_path):
    path = write_synthetic_dataset(str(tmp_path / "s.bin"), n_episodes=6, T=8, hw=16)
    d0 = VLNSampleDataset(path, rank=0, world_size=2)
    d1 = VLNSampleDataset(path, rank=1, world_size=2)
    assert len(d0.ds) + len(d1.ds) == 6
    assert set(d0.ds.keys).isdisjoint(d1.ds.keys)


def test_rdp_dataset(tmp_path):
    path = write_synthetic_rdp_dataset(str(tmp_path / "rdp.bin"), n_episodes=2, T=12, hw=16)
    make_epoch = make_rdp_dataloader(path, batch_size=2, len_traj_pred=8)
    b = next(iter(make_epoch()))
    assert b["observations"]["actions"].shape == (2, 8, 3)
    assert np.abs(b["observations"]["actions"]).max() <= 1.0
    assert b["observations"]["imu"].shape == (2, 3)


def test_relative_traj_geometry():
    # straight line along +x: deltas should all be forward steps
    T = 10
    positions = np.stack([np.arange(T) * 0.25, np.zeros(T)], 1)
    yaws = np.zeros(T)
    tr = relative_traj(positions, yaws, 0, 8, 8)
    np.testing.assert_allclose(tr[:, 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(tr[:, 1], 0.0, atol=1e-6)


def test_n1_dataset_tokenize_and_pack(tmp_path):
    from internnav_tpu.model.basemodel.internvla_n1.policy import SimpleTokenizer

    path = write_synthetic_n1_dataset(str(tmp_path / "n1.bin"), n_episodes=2, T=8, hw=28)
    ds = N1SampleDataset(path, predict_step_nums=8)
    samples = []
    for s in ds:
        samples.append(s)
        if len(samples) >= 6:
            break
    assert any(s.has_traj for s in samples) or any("STOP" in s.answer for s in samples)

    tok = SimpleTokenizer()
    rows = [tokenize_sample(s, tok, tokens_per_image=4, n_query=2) for s in samples[:4]]
    r = rows[0]
    # labels masked on the prompt, supervised on the answer
    assert (r["labels"][:5] == IGNORE_INDEX).all()
    assert (r["labels"] != IGNORE_INDEX).sum() > 0
    # traj tokens never supervised
    traj_positions = r["input_ids"] == 151667
    assert (r["labels"][traj_positions] == IGNORE_INDEX).all()

    batch = n1_collate_fn(rows, predict_step_nums=8)
    assert batch["input_ids"].shape[0] == 4
    assert batch["traj_poses"].shape[1:] == (8, 3)

    packed = n1_packed_collate_fn(rows, max_len=1024, predict_step_nums=8)
    assert packed["input_ids"].shape == (1, 1024)
    seg = packed["segment_ids"][0]
    assert packed["num_packed"] >= 1
    # segments are contiguous and padding is -1
    assert seg[-1] == -1 or packed["num_packed"] == len(rows)


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    p = Prefetcher(gen())
    it = iter(p)
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_vlln_dataset_and_combined(tmp_path):
    from internnav_tpu.dataset.vlln_dataset import (
        CombinedDataset,
        VLLNSampleDataset,
        write_synthetic_vlln_dataset,
    )

    path = write_synthetic_vlln_dataset(str(tmp_path / "vlln.bin"), n_episodes=2)
    ds = VLLNSampleDataset(path, num_history=2)
    samples = list(ds)
    assert len(samples) > 4
    questions = [s for s in samples if s.answer.endswith("?")]
    answered = [s for s in samples if "resident replied" in s.prompt]
    assert questions and answered

    combined = CombinedDataset([["a", "b", "c"], ["x"]], weights=[2, 1])
    assert list(combined) == ["a", "b", "x", "c"]


def test_ema_schedule():
    import jax.numpy as jnp

    from internnav_tpu.trainer.ema import ema_decay, ema_init, ema_update

    params = {"w": jnp.ones(3)}
    ema = ema_init(params)
    # step 0: decay 0 → ema == params
    new_params = {"w": jnp.full(3, 2.0)}
    ema = ema_update(ema, new_params, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(ema["w"]), 2.0)
    # late steps: decay near max → ema barely moves
    d = float(ema_decay(jnp.asarray(100000)))
    assert 0.99 < d <= 0.9999
    ema2 = ema_update(ema, {"w": jnp.zeros(3)}, jnp.asarray(100000))
    assert np.asarray(ema2["w"]).min() > 1.9


def test_realworld_env_with_stub_io():
    from internnav_tpu.configs import EnvCfg
    from internnav_tpu.realworld.env import RealWorldEnv

    commands = []
    env = RealWorldEnv(EnvCfg(env_type="realworld", env_settings={
        "camera_fn": lambda: {"rgb": np.ones((8, 8, 3), np.uint8)},
        "command_fn": lambda v, w, d: commands.append((v, w)),
        "capture_hz": 50, "action_duration_s": 0.01,
    }))
    obs = env.reset()
    assert obs[0]["rgb"].shape == (8, 8, 3)
    env.step([1])
    env.step([2])
    env.close()
    assert (0.4, 0.0) in commands and (0.0, 0.6) in commands


def test_lerobot_writer_roundtrip(tmp_path):
    """LeRobot WRITER (scripts/dataset_converters/store_to_lerobot.py;
    reference vlnce2lerobot.py:128-620) round-trips through the
    LerobotAsTrajStore reader: layout, parquet columns, video, meta."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    pytest.importorskip("pyarrow")
    pytest.importorskip("cv2")
    from scripts.dataset_converters.store_to_lerobot import LeRobotWriter

    from internnav_tpu.dataset.lerobot import LerobotAsTrajStore

    rs = np.random.RandomState(0)
    eps = []
    for i in range(2):
        T = 6 + i
        eps.append({
            "rgb": rs.randint(0, 255, (T, 32, 48, 3)).astype(np.uint8),
            "actions": rs.randint(0, 4, (T,)).astype(np.int64),
            "positions": rs.randn(T, 3).astype(np.float32),
            "yaws": rs.randn(T).astype(np.float32),
            "instruction_text": f"walk to the chair {i}",
        })
    root = tmp_path / "lr"
    w = LeRobotWriter(str(root), fps=5)
    for ep in eps:
        w.add_episode(ep)
    w.finalize()

    info = json.loads((root / "meta" / "info.json").read_text())
    assert info["total_episodes"] == 2
    assert info["total_frames"] == 13
    assert info["codebase_version"] == "v2.1"
    stats_lines = (root / "meta" / "episodes_stats.jsonl").read_text().splitlines()
    assert len(stats_lines) == 2
    assert "action" in json.loads(stats_lines[0])["stats"]

    store = LerobotAsTrajStore(str(root))
    assert len(store) == 2
    for i, key in enumerate(store.keys()):
        got = store.get_tree(key)
        np.testing.assert_array_equal(got["actions"], eps[i]["actions"])
        np.testing.assert_allclose(got["positions"],
                                   eps[i]["positions"], atol=1e-6)
        assert got["instruction_text"] == eps[i]["instruction_text"]
        # mp4 is lossy: frames decode back at the right shape/count
        assert got["rgb"].shape == eps[i]["rgb"].shape
