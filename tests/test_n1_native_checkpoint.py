"""InternVLA-N1 native checkpoint round-trip (save_pretrained /
from_pretrained): bit-exact across bf16 and int4 trees (int4 leaves are
stored as int8 values — lossless — and restored to jnp.int4 from the init
tree's dtypes). The torch->native conversion CLI
(scripts/tools/convert_checkpoint.py) rides on these two methods."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy


@pytest.mark.parametrize("wdt", ["bf16", "int4"])
def test_n1_native_checkpoint_roundtrip(tmp_path, wdt):
    cfg = InternVLAN1Config.tiny()
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(
            cfg.text, weight_dtype=wdt,
            quant_group_size=16 if wdt == "int4" else None))
    pol = InternVLAN1Policy.build(cfg, image_hw=56)
    d = str(tmp_path / wdt)
    pol.save_pretrained(d)
    pol2 = InternVLAN1Policy.from_pretrained(d, cfg, image_hw=56)

    leaves = jax.tree_util.tree_leaves(pol.params)
    leaves2 = jax.tree_util.tree_leaves(pol2.params)
    assert len(leaves) == len(leaves2)
    saw_int4 = False
    for a, b in zip(leaves, leaves2):
        assert a.dtype == b.dtype
        saw_int4 |= a.dtype == jnp.int4
        np.testing.assert_array_equal(
            np.asarray(a.astype(jnp.float32)),
            np.asarray(b.astype(jnp.float32)))
    assert saw_int4 == (wdt == "int4")

    # a config whose weight_dtype disagrees with the checkpoint must fail
    # with a CLEAR error, not a pytree-structure mismatch deep in restore
    other = dataclasses.replace(
        cfg, text=dataclasses.replace(
            cfg.text, weight_dtype="bf16" if wdt == "int4" else "int4"))
    with pytest.raises(ValueError, match="weight_dtype"):
        InternVLAN1Policy.from_pretrained(d, other, image_hw=56)
