"""Pure-python LMDB reader/writer + msgpack-numpy codec tests."""

import numpy as np
import pytest


def test_lmdb_roundtrip_inline_and_overflow(tmp_path):
    from internnav_tpu.dataset.lmdb_reader import LMDBReader, LMDBWriter

    rs = np.random.RandomState(0)
    data = {
        b"a_small": b"hello",
        b"b_mid": bytes(rs.randint(0, 256, 900, dtype=np.uint8)),
        # > page_size/2 -> overflow chain across multiple pages
        b"c_big": bytes(rs.randint(0, 256, 10_000, dtype=np.uint8)),
        b"d_huge": bytes(rs.randint(0, 256, 100_000, dtype=np.uint8)),
        b"e_empty": b"",
    }
    with LMDBWriter(str(tmp_path / "env")) as w:
        for k, v in data.items():
            w.put(k, v)

    db = LMDBReader(str(tmp_path / "env"))
    assert len(db) == len(data)
    got = dict(db.items())
    assert got == data
    assert db.keys() == sorted(data)
    assert db.get(b"c_big") == data[b"c_big"]
    assert db.get(b"missing") is None


def test_lmdb_many_keys_multi_leaf(tmp_path):
    """Enough entries to force multiple leaf pages + a branch level."""
    from internnav_tpu.dataset.lmdb_reader import LMDBReader, LMDBWriter

    data = {f"key_{i:05d}".encode(): (f"value_{i}" * 7).encode()
            for i in range(600)}
    with LMDBWriter(str(tmp_path / "env")) as w:
        for k, v in data.items():
            w.put(k, v)
    db = LMDBReader(str(tmp_path / "env"))
    assert len(db) == 600
    assert dict(db.items()) == data


def test_msgpack_numpy_codec():
    from internnav_tpu.dataset.lmdb_reader import packb, unpackb

    rec = {
        "rgb": np.random.RandomState(0).randint(0, 255, (3, 8, 8, 3),
                                                dtype=np.uint8),
        "yaw": np.float32(1.25),
        "name": "ep0",
        "steps": 7,
        "nested": {"gps": np.arange(6, dtype=np.float64).reshape(3, 2)},
    }
    out = unpackb(packb(rec))
    np.testing.assert_array_equal(out["rgb"], rec["rgb"])
    assert out["yaw"] == rec["yaw"] and out["name"] == "ep0" and out["steps"] == 7
    np.testing.assert_array_equal(out["nested"]["gps"], rec["nested"]["gps"])


def test_lmdb_trajectory_reader_and_import(tmp_path):
    """End-to-end: reference-format LMDB of episode_data dicts -> reader ->
    native TrajStore import (the lmdb_to_store converter path)."""
    from internnav_tpu.dataset.lmdb_reader import (
        LMDBWriter,
        LmdbTrajectoryReader,
        packb,
    )
    from internnav_tpu.dataset.traj_store import TrajStore

    rs = np.random.RandomState(1)
    episodes = {}
    with LMDBWriter(str(tmp_path / "env")) as w:
        for i in range(3):
            ep = {
                "episode_data": {
                    "rgb": rs.randint(0, 255, (5, 16, 16, 3), np.uint8),
                    "depth": rs.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32),
                    "actions": rs.randint(0, 4, (5,)).astype(np.int64),
                }
            }
            episodes[f"scene_{i}"] = ep
            w.put(f"scene_{i}", packb(ep))

    src = LmdbTrajectoryReader(str(tmp_path / "env"))
    assert sorted(src.keys()) == sorted(episodes)
    np.testing.assert_array_equal(
        src["scene_1"]["episode_data"]["rgb"],
        episodes["scene_1"]["episode_data"]["rgb"])

    store = TrajStore(str(tmp_path / "store.bin"), writable=True)
    for key, record in src.items():
        store.put_tree(key, record["episode_data"])
    store.close()
    rd = TrajStore(str(tmp_path / "store.bin"), writable=False)
    tree = rd.get_tree("scene_2")
    np.testing.assert_array_equal(
        tree["rgb"], episodes["scene_2"]["episode_data"]["rgb"])


def test_native_lmdb_reader_matches_python(tmp_path):
    """The C++ mmap walker must agree byte-for-byte with the python parser."""
    import pytest

    from internnav_tpu.dataset.lmdb_reader import (
        LMDBReader,
        LMDBWriter,
        NativeLMDBReader,
        _NATIVE_LIB,
        open_lmdb,
    )
    import os

    if not os.path.exists(_NATIVE_LIB):
        pytest.skip("native lmdb reader not built")
    rs = np.random.RandomState(2)
    data = {f"k{i:04d}".encode(): bytes(rs.randint(0, 256, rs.randint(4, 9000),
                                                   dtype=np.uint8))
            for i in range(200)}
    with LMDBWriter(str(tmp_path / "env")) as w:
        for k, v in data.items():
            w.put(k, v)
    py = LMDBReader(str(tmp_path / "env"))
    nat = NativeLMDBReader(str(tmp_path / "env"))
    assert len(nat) == len(py) == 200
    assert dict(nat.items()) == dict(py.items()) == data
    assert nat.get(b"k0100") == data[b"k0100"]
    assert nat.get(b"nope") is None
    nat.close()
    assert isinstance(open_lmdb(str(tmp_path / "env")), NativeLMDBReader)
