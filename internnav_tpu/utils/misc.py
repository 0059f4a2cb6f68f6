"""Misc helpers: seeding, pytree observation batching, host↔device movement.

`batch_obs` is the TPU-native equivalent of the reference's TensorDict-based
batching (internnav/agent/utils/common.py:23-48): a list of per-env obs dicts
becomes one pytree of stacked numpy arrays ready for device_put. Non-array
leaves (strings, instruction text) are collected into python lists.
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def batch_obs(
    observations: Sequence[Dict[str, Any]],
    dtype_overrides: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Stack a list of per-env observation dicts into arrays along axis 0."""
    if not observations:
        return {}
    keys = observations[0].keys()
    out: Dict[str, Any] = {}
    for k in keys:
        vals = [obs[k] for obs in observations]
        first = vals[0]
        if isinstance(first, (np.ndarray, np.generic, float, int, bool)):
            arr = np.stack([np.asarray(v) for v in vals], axis=0)
            if dtype_overrides and k in dtype_overrides:
                arr = arr.astype(dtype_overrides[k])
            out[k] = arr
        elif isinstance(first, dict):
            out[k] = batch_obs(vals, dtype_overrides)
        else:
            out[k] = list(vals)
    return out


def unbatch_obs(batched: Dict[str, Any], index: int) -> Dict[str, Any]:
    """Inverse of batch_obs for a single env index."""
    out: Dict[str, Any] = {}
    for k, v in batched.items():
        if isinstance(v, dict):
            out[k] = unbatch_obs(v, index)
        elif isinstance(v, (np.ndarray, list)):
            out[k] = v[index]
        else:
            out[k] = v
    return out


def tree_device_put(tree, device=None, donate: bool = False):
    """Move a pytree of numpy arrays onto the default (or given) device."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device) if isinstance(x, (np.ndarray, np.generic)) else x,
        tree,
    )
