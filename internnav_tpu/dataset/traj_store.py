"""Trajectory store: ctypes binding to the native mmap KV store.

Replaces the reference's LMDB trajectory/resume stores (SURVEY.md §2.9
native-deps table; reference cma_lmdb_dataset.py:82, data_collector.py:109).
The native library (native/traj_store) is auto-built with g++ on first use;
a pure-python fallback (same on-disk format) covers environments without a
compiler.

Values are arbitrary bytes; `put_tree`/`get_tree` serialize pytrees of
numpy arrays with a compact self-describing header (the msgpack_numpy
equivalent — msgpack_numpy is not installed here).
"""

from __future__ import annotations

import ctypes
import io
import os
import struct
import subprocess
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "traj_store")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtraj_store.so"))
_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ts_put.restype = ctypes.c_int
    lib.ts_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
                           ctypes.c_char_p, ctypes.c_uint32]
    lib.ts_get.restype = ctypes.c_int
    lib.ts_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
                           ctypes.POINTER(ctypes.c_char_p),
                           ctypes.POINTER(ctypes.c_uint32)]
    lib.ts_count.restype = ctypes.c_long
    lib.ts_count.argtypes = [ctypes.c_void_p]
    lib.ts_key_at.restype = ctypes.c_int
    lib.ts_key_at.argtypes = [ctypes.c_void_p, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_char_p),
                              ctypes.POINTER(ctypes.c_uint32)]
    lib.ts_sync.restype = ctypes.c_int
    lib.ts_sync.argtypes = [ctypes.c_void_p]
    lib.ts_close.restype = None
    lib.ts_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class TrajStore:
    """dict-like append-only byte store."""

    def __init__(self, path: str, writable: bool = True, force_python: bool = False):
        self.path = path
        self.writable = writable
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        lib = None if force_python else _load_native()
        self._lib = lib
        if lib is not None:
            if writable and not os.path.exists(path):
                open(path, "ab").close()
            self._h = lib.ts_open(path.encode(), 1 if writable else 0)
            if not self._h:
                raise IOError(f"ts_open failed for {path}")
        else:
            self._h = None
            self._py_index: Dict[bytes, bytes] = {}
            self._py_load()

    # ----------------------------------------------------- python fallback
    def _py_load(self):
        if not os.path.exists(self.path):
            return
        size_path = self.path + ".size"
        limit = os.path.getsize(self.path)
        if os.path.exists(size_path):
            with open(size_path, "rb") as f:
                rec = struct.unpack("<Q", f.read(8))[0]
                limit = min(limit, rec) if rec else limit
        with open(self.path, "rb") as f:
            data = f.read(limit)
        off = 0
        while off + 8 <= len(data):
            klen, vlen = struct.unpack_from("<II", data, off)
            end = off + 8 + klen + vlen
            if end > len(data) or klen == 0:
                break
            self._py_index[data[off + 8 : off + 8 + klen]] = data[off + 8 + klen : end]
            off = end

    # ------------------------------------------------------------- raw api
    def put(self, key: str, value: bytes) -> None:
        kb = key.encode()
        if self._h is not None:
            rc = self._lib.ts_put(self._h, kb, len(kb), value, len(value))
            if rc != 0:
                raise IOError(f"ts_put rc={rc}")
        else:
            with open(self.path, "ab") as f:
                f.write(struct.pack("<II", len(kb), len(value)) + kb + value)
            with open(self.path + ".size", "wb") as f:
                f.write(struct.pack("<Q", os.path.getsize(self.path)))
            self._py_index[kb] = value

    def get(self, key: str) -> Optional[bytes]:
        kb = key.encode()
        if self._h is not None:
            out = ctypes.c_char_p()
            n = ctypes.c_uint32()
            rc = self._lib.ts_get(self._h, kb, len(kb), ctypes.byref(out), ctypes.byref(n))
            if rc == 1:
                return None
            if rc != 0:
                raise IOError(f"ts_get rc={rc}")
            return ctypes.string_at(out, n.value)
        return self._py_index.get(kb)

    def keys(self) -> List[str]:
        if self._h is not None:
            out = []
            for i in range(self._lib.ts_count(self._h)):
                k = ctypes.c_char_p()
                n = ctypes.c_uint32()
                self._lib.ts_key_at(self._h, i, ctypes.byref(k), ctypes.byref(n))
                out.append(ctypes.string_at(k, n.value).decode())
            return out
        return [k.decode() for k in self._py_index]

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.ts_count(self._h))
        return len(self._py_index)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def sync(self) -> None:
        if self._h is not None:
            self._lib.ts_sync(self._h)

    def close(self) -> None:
        if self._h is not None:
            self._lib.ts_close(self._h)
            self._h = None

    # ---------------------------------------------------------- tree codec
    @staticmethod
    def encode_tree(tree: Dict[str, Any]) -> bytes:
        """Serialize a flat dict of numpy arrays / scalars / str / bytes."""
        buf = io.BytesIO()
        items = list(tree.items())
        buf.write(struct.pack("<I", len(items)))
        for k, v in items:
            kb = k.encode()
            buf.write(struct.pack("<H", len(kb)) + kb)
            if isinstance(v, str):
                vb = v.encode()
                buf.write(b"s" + struct.pack("<I", len(vb)) + vb)
            elif isinstance(v, bytes):
                buf.write(b"b" + struct.pack("<I", len(v)) + v)
            else:
                arr = np.asarray(v)
                hdr = io.BytesIO()
                np.save(hdr, arr, allow_pickle=False)
                hb = hdr.getvalue()
                buf.write(b"n" + struct.pack("<I", len(hb)) + hb)
        return buf.getvalue()

    @staticmethod
    def decode_tree(data: bytes) -> Dict[str, Any]:
        buf = io.BytesIO(data)
        (n,) = struct.unpack("<I", buf.read(4))
        out: Dict[str, Any] = {}
        for _ in range(n):
            (klen,) = struct.unpack("<H", buf.read(2))
            k = buf.read(klen).decode()
            tag = buf.read(1)
            (vlen,) = struct.unpack("<I", buf.read(4))
            vb = buf.read(vlen)
            if tag == b"s":
                out[k] = vb.decode()
            elif tag == b"b":
                out[k] = vb
            else:
                out[k] = np.load(io.BytesIO(vb), allow_pickle=False)
        return out

    def put_tree(self, key: str, tree: Dict[str, Any]) -> None:
        self.put(key, self.encode_tree(tree))

    def get_tree(self, key: str) -> Optional[Dict[str, Any]]:
        raw = self.get(key)
        return None if raw is None else self.decode_tree(raw)
