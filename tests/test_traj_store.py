"""Native trajectory store tests (C++ mmap store + python fallback parity)."""

import os

import numpy as np
import pytest

from internnav_tpu.dataset.traj_store import TrajStore, _load_native


def _roundtrip(tmp_path, force_python):
    path = str(tmp_path / ("py" if force_python else "native") / "store.bin")
    s = TrajStore(path, writable=True, force_python=force_python)
    s.put("a", b"hello")
    s.put("b", b"world")
    s.put("a", b"hello2")  # overwrite: last write wins
    assert s.get("a") == b"hello2"
    assert s.get("b") == b"world"
    assert s.get("missing") is None
    assert len(s) == 2
    assert set(s.keys()) == {"a", "b"}
    tree = {"rgb": np.arange(12, dtype=np.uint8).reshape(3, 4),
            "pose": np.ones(3), "name": "ep0", "blob": b"\x00\x01"}
    s.put_tree("ep0", tree)
    back = s.get_tree("ep0")
    np.testing.assert_array_equal(back["rgb"], tree["rgb"])
    np.testing.assert_array_equal(back["pose"], tree["pose"])
    assert back["name"] == "ep0" and back["blob"] == b"\x00\x01"
    s.sync()
    s.close() if not force_python else None

    # reopen read-only and verify persistence
    s2 = TrajStore(path, writable=False, force_python=force_python)
    assert s2.get("a") == b"hello2"
    assert len(s2) == 3
    if not force_python:
        s2.close()


def test_native_store_roundtrip(tmp_path):
    if _load_native() is None:
        pytest.skip("native lib unavailable (no compiler)")
    _roundtrip(tmp_path, force_python=False)


def test_python_fallback_roundtrip(tmp_path):
    _roundtrip(tmp_path, force_python=True)


def test_formats_are_interchangeable(tmp_path):
    """Files written natively must be readable by the python fallback."""
    if _load_native() is None:
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "x.bin")
    s = TrajStore(path, writable=True)
    s.put("k1", b"v1")
    s.put("k2", b"v" * 1000)
    s.sync()
    s.close()
    p = TrajStore(path, writable=False, force_python=True)
    assert p.get("k1") == b"v1" and p.get("k2") == b"v" * 1000


def test_native_survives_torn_tail(tmp_path):
    if _load_native() is None:
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "torn.bin")
    s = TrajStore(path, writable=True)
    s.put("good", b"data")
    s.sync()
    s.close()
    # simulate a crash mid-append: garbage partial record at the tail
    with open(path, "ab") as f:
        f.write(b"\x10\x00\x00\x00\xff\xff")
    s2 = TrajStore(path, writable=True)
    assert s2.get("good") == b"data"
    assert len(s2) == 1
    s2.close()
