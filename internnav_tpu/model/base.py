"""Policy base: Flax module + params bundle with HF-style persistence.

Plays the role of the reference's `PreTrainedModel` subclass policies
(e.g. cma_policy.py:67-121): a dict-in/dict-out `forward(batch)` with a
`mode` switch, `from_pretrained` with tolerant partial loading (reference
prints incompatible keys and continues), and `save_pretrained` writing a
config.json + msgpack weights.

TPU notes: `forward` dispatches to jitted apply functions cached per
(mode, shapes); params live on device; batches are host numpy pytrees
moved with device_put.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.utils.logging import get_logger

WEIGHTS_NAME = "params.msgpack"
CONFIG_NAME = "config.json"


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        path = prefix + (k,)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def merge_params(init_params: Dict, loaded: Dict, logger=None) -> Dict:
    """Tolerant merge: take loaded leaves whose path+shape match the init
    tree; keep init values (and warn) otherwise — the reference's partial
    state_dict loading semantics (cma_policy.py:110-121, navdp.py:116-163).
    """
    log = (logger or get_logger()).warning
    init_flat = _flatten(init_params)
    loaded_flat = _flatten(loaded)
    merged = dict(init_flat)
    n_loaded = 0
    for path, v in loaded_flat.items():
        if path in init_flat:
            if tuple(np.shape(v)) == tuple(np.shape(init_flat[path])):
                merged[path] = jnp.asarray(v, dtype=init_flat[path].dtype)
                n_loaded += 1
            else:
                log("shape mismatch for %s: ckpt %s vs model %s — keeping init",
                    "/".join(path), np.shape(v), np.shape(init_flat[path]))
        else:
            log("unexpected key in checkpoint: %s", "/".join(path))
    missing = set(init_flat) - set(loaded_flat)
    if missing:
        log("missing %d keys in checkpoint (kept init), e.g. %s",
            len(missing), "/".join(sorted(missing)[0]))
    return _unflatten(merged)


class Policy:
    """A (module, params) bundle with the reference's policy API."""

    def __init__(self, module, params, cfg: ModelCfg):
        self.module = module
        self.params = params
        self.cfg = cfg
        self._jit_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------ applying
    def apply(self, *args, method=None, **kwargs):
        return self.module.apply({"params": self.params}, *args, method=method, **kwargs)

    def jit_apply(self, key: str, fn_builder: Callable[[], Callable]) -> Callable:
        if key not in self._jit_cache:
            self._jit_cache[key] = fn_builder()
        return self._jit_cache[key]

    def forward(self, batch: Dict[str, Any]):
        """dict-in/dict-out with mode ∈ {train, inference, features} —
        subclass policies override to match their reference forward."""
        raise NotImplementedError

    # --------------------------------------------------------- persistence
    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, CONFIG_NAME), "w") as f:
            json.dump(self.cfg.model_dump(), f, indent=2, default=str)
        with open(os.path.join(path, WEIGHTS_NAME), "wb") as f:
            f.write(serialization.to_bytes(unfreeze(self.params)))

    #: name of a `internnav_tpu.model.weights.convert` function mapping a
    #: torch state dict -> this policy's flax param tree. Set by policies
    #: that have a converter; enables `from_pretrained` on reference-format
    #: torch checkpoints (auto-detected) in addition to native msgpack.
    TORCH_CONVERTER_NAME: Optional[str] = None

    _TORCH_EXTS = (".pth", ".pt", ".bin", ".safetensors")

    @classmethod
    def _is_torch_checkpoint(cls, path: str) -> bool:
        """True when `path` holds reference-format torch weights rather
        than the native msgpack format: a torch weight file, or a
        directory with torch weight files and no params.msgpack."""
        if os.path.isdir(path):
            if os.path.exists(os.path.join(path, WEIGHTS_NAME)):
                return False
            return any(f.endswith(cls._TORCH_EXTS) for f in os.listdir(path))
        return path.endswith(cls._TORCH_EXTS)

    @classmethod
    def load_params_file(cls, path: str, init_params: Dict) -> Dict:
        if cls.TORCH_CONVERTER_NAME and cls._is_torch_checkpoint(path):
            from internnav_tpu.model.weights import convert as _convert

            sd = _convert.load_torch_state_dict(path)
            converted = getattr(_convert, cls.TORCH_CONVERTER_NAME)(sd)
            return merge_params(unfreeze(init_params), converted)
        weights_path = os.path.join(path, WEIGHTS_NAME) if os.path.isdir(path) else path
        if not os.path.exists(weights_path):
            raise FileNotFoundError(f"no weights at {weights_path}")
        with open(weights_path, "rb") as f:
            raw = f.read()
        loaded = serialization.msgpack_restore(raw)
        if "params" in loaded and isinstance(loaded["params"], dict):
            loaded = loaded["params"]
        return merge_params(unfreeze(init_params), loaded)

    @classmethod
    def load_config(cls, path: str, default: Optional[ModelCfg] = None) -> ModelCfg:
        cfg_path = os.path.join(path, CONFIG_NAME) if os.path.isdir(path) \
            else os.path.join(os.path.dirname(path), CONFIG_NAME)
        if os.path.exists(cfg_path):
            try:
                with open(cfg_path) as f:
                    raw = json.load(f)
                # ModelCfg has every field defaulted + extra='allow', so ANY
                # dict "validates" — an HF/reference config.json next to a
                # torch checkpoint would silently become a defaults-populated
                # ModelCfg and replace the caller's real config. Require the
                # file to actually look native (save_pretrained dumps every
                # ModelCfg field) before trusting it.
                if not isinstance(raw, dict):
                    raise ValueError("config.json is not a mapping")
                native_keys = set(ModelCfg.model_fields)
                if len(native_keys & set(raw)) < max(1, len(native_keys) // 2):
                    raise ValueError(
                        f"config.json shares "
                        f"{len(native_keys & set(raw))}/{len(native_keys)} "
                        "keys with ModelCfg — not a native config")
                return ModelCfg.model_validate(raw)
            except Exception as e:
                # a reference/HF-format config.json next to a torch
                # checkpoint: not our schema — fall back to the caller's
                # default (tolerant-loading semantics)
                if default is not None:
                    get_logger().warning(
                        "config at %s is not a native ModelCfg (%s); using "
                        "the provided default", cfg_path, e)
                    return default
                raise
        if default is not None:
            return default
        raise FileNotFoundError(cfg_path)
