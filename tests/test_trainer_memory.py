"""Trainer HBM-residency invariants (round-5 bench --train OOM fixes).

At 7B width, two full param trees (4.7 GB each) or an unmasked Adam
state (8.9 GB, frozen towers included) next to the masked one (6.2 GB)
blow the 16 GB chip before activations. These tests pin the two fixes:

1. Trainer.__init__ aliases policy.params to its sharded tree — no
   second resident copy (base.py).
2. Subclass optimizer masking happens via the _wrap_tx hook BEFORE any
   opt_state materializes, so Adam moments exist for the trainable
   subtrees only and are never transiently allocated for the full tree
   (internvla_n1_trainer.py).
"""

from __future__ import annotations

import jax
import numpy as np
import optax
import pytest

from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
from internnav_tpu.model.basemodel.internvla_n1.policy import (
    InternVLAN1Policy,
    SimpleTokenizer,
)
from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer


@pytest.fixture(scope="module")
def trainer():
    cfg = InternVLAN1Config.tiny("nextdit_async")
    pol = InternVLAN1Policy.build(cfg, image_hw=56)
    pol.tokenizer = SimpleTokenizer(cfg.text.vocab_size)
    exp = ExpCfg(name="t", model_name="internvla_n1", output_dir="/tmp/tm",
                 mesh=MeshCfg(axes={"dp": -1}, param_sharding="replicated"))
    exp.il.opt_state_dtype = "bf16"
    return InternVLAN1Trainer(exp, pol, total_steps=3,
                              tune_llm=True, tune_mm_vision=False)


def test_policy_params_aliased(trainer):
    """No second resident param tree: the policy shares the trainer's."""
    assert trainer.policy.params is trainer.params


def test_opt_state_masks_frozen_subtrees(trainer):
    """Adam moments exist only for trainable leaves; frozen leaves are
    optax MaskedNodes (no buffers), and no full-tree state was built."""
    leaves_with_state = 0
    masked = 0

    def count(x):
        nonlocal leaves_with_state, masked
        if isinstance(x, optax.MaskedNode):
            masked += 1
        elif hasattr(x, "shape") and getattr(x, "ndim", 0) > 0:
            leaves_with_state += 1

    jax.tree_util.tree_map(
        count, trainer.opt_state,
        is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    assert leaves_with_state > 0  # trainable moments exist
    assert masked > 0  # frozen towers carry no moments
    n_params = len(jax.tree_util.tree_leaves(trainer.params))
    # mu+nu per trainable leaf must be well under 2x the full tree
    assert leaves_with_state < 2 * n_params


def test_wrap_tx_called_once_no_full_init(trainer):
    """The masked optimizer was built pre-init: updating with it runs and
    leaves frozen params untouched (set_to_zero semantics)."""
    g = jax.tree_util.tree_map(lambda p: np.ones_like(p), trainer.params)
    updates, _ = trainer.tx.update(g, trainer.opt_state, trainer.params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    # tune_mm_vision=False freezes the 'visual' root
    # (trainability_labels, internvla_n1_trainer.py:46-47)
    vis = [(p, v) for p, v in flat
           if getattr(p[0], "key", str(p[0])) == "visual"]
    assert vis, "param tree should contain the visual tower"
    froze = [p for p, v in vis if np.all(np.asarray(v) == 0)]
    assert len(froze) == len(vis), \
        "frozen visual tower should receive all-zero updates"
