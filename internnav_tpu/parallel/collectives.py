"""Collective helpers — the dist.py surface, TPU-native.

Reference parity (internnav/utils/dist.py): get_rank/get_world_size
(:246-254), all_reduce_mean (:256-264), save_on_master (:188-190),
is_main_process. In-graph collectives are plain jax.lax primitives under
pjit/shard_map; host-level reductions go through multihost_utils.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(save_fn, *args, **kwargs) -> None:
    """Run a checkpoint/IO function on rank 0 only (dist.py:188-190)."""
    if is_main_process():
        save_fn(*args, **kwargs)


def all_reduce_mean(x: Any) -> Any:
    """Host-level mean across processes (dist.py:256-264). No-op single-host."""
    if get_world_size() == 1:
        return x
    from jax.experimental import multihost_utils

    arr = np.asarray(x, np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    return gathered.mean(axis=0).astype(np.asarray(x).dtype)


def host_broadcast(x: Any) -> Any:
    """Broadcast a host value from rank 0 to all (config sync)."""
    if get_world_size() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(x)


# ----------------------------------------------------- in-graph collectives
def psum_mean(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Mean over a mesh axis inside pjit/shard_map."""
    return jax.lax.psum(x, axis_name) / jax.lax.axis_size(axis_name)


def grad_allreduce(grads, axis_name: str):
    """Explicit DP gradient allreduce for shard_map-style training (pjit
    with replicated params inserts this automatically)."""
    return jax.tree_util.tree_map(lambda g: psum_mean(g, axis_name), grads)
