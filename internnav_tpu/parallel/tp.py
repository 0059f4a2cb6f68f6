"""Tensor-parallel sharding rules for the Qwen System-2 decoder.

SURVEY.md §2.9: the reference has no TP; for the 7B Qwen2.5-VL over ICI it
is the natural addition (the params exceed one v5e chip in fp32). Rules
follow the Megatron layout:
- attention q/k/v kernels: shard the head (output) dim over 'tp';
  o_proj: shard the input dim (row-parallel, psum by XLA);
- MLP gate/up: column-parallel (output dim); down: row-parallel;
- embeddings + lm_head: shard the vocab dim;
- everything else replicated.

Applied as NamedShardings on the param tree; XLA inserts the all-reduces
(jit with in_shardings). Works under the same jit as FSDP on other axes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_TP_RULES = (
    # (path suffix, partition spec for the kernel)
    (("q_proj", "kernel"), P(None, "tp")),
    (("k_proj", "kernel"), P(None, "tp")),
    (("v_proj", "kernel"), P(None, "tp")),
    (("q_proj", "bias"), P("tp")),
    (("k_proj", "bias"), P("tp")),
    (("v_proj", "bias"), P("tp")),
    (("o_proj", "kernel"), P("tp", None)),
    (("gate_proj", "kernel"), P(None, "tp")),
    (("up_proj", "kernel"), P(None, "tp")),
    (("down_proj", "kernel"), P("tp", None)),
    (("lm_head", "kernel"), P(None, "tp")),
    (("embed_tokens", "embedding"), P("tp", None)),
)


def qwen_tp_sharding(mesh: Mesh, params: Dict[str, Any],
                     dp_axis: str = "dp", tp_axis: str = "tp",
                     fsdp_rest: bool = False):
    """NamedSharding tree: TP rules for the language model, replicated (or
    dp-FSDP) elsewhere."""
    n_tp = mesh.shape[tp_axis]

    def spec_for(path, x):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        in_llm = keys and keys[0] == "language_model"
        if in_llm:
            for suffix, spec in _TP_RULES:
                if keys[-len(suffix):] == suffix:
                    # verify divisibility; fall back to replicated otherwise
                    dims = np.shape(x)
                    ok = True
                    for d, s in zip(dims, spec):
                        if s == tp_axis and d % n_tp:
                            ok = False
                    if ok:
                        # rename axis placeholder
                        spec = P(*[tp_axis if s == "tp" else s for s in spec])
                        return NamedSharding(mesh, spec)
        if fsdp_rest:
            dims = np.shape(x)
            n_dp = mesh.shape[dp_axis]
            if np.prod(dims, dtype=np.int64) >= 2**14:
                cand = [(d, i) for i, d in enumerate(dims) if d % n_dp == 0]
                if cand:
                    _, idx = max(cand)
                    s = [None] * len(dims)
                    s[idx] = dp_axis
                    return NamedSharding(mesh, P(*s))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
