"""Import a reference LMDB trajectory dataset into the native traj store.

The reference ships VLN-PE/VLN-CE trajectory data as LMDB environments of
msgpack_numpy dicts keyed by path_key (internnav/dataset/
cma_lmdb_dataset.py:41-95). This converter reads them with the
pure-python LMDB parser (no lmdb C binding needed) and writes our native
TrajStore so every training pipeline here can consume them.

Usage:
    python scripts/dataset_converters/lmdb_to_store.py \
        --lmdb data/trajectory_data/train --out data/trajectories.bin
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmdb", required=True, help="LMDB env dir (or data.mdb)")
    ap.add_argument("--out", required=True, help="output TrajStore path")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    from internnav_tpu.dataset.lmdb_reader import LmdbTrajectoryReader
    from internnav_tpu.dataset.traj_store import TrajStore

    src = LmdbTrajectoryReader(args.lmdb)
    store = TrajStore(args.out, writable=True)
    n = 0
    for key, record in src.items():
        tree = record.get("episode_data", record)
        store.put_tree(key, tree)
        n += 1
        if args.limit and n >= args.limit:
            break
    store.close()
    print(f"imported {n} trajectories from {args.lmdb} -> {args.out}")


if __name__ == "__main__":
    main()
