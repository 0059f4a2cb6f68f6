"""Tensor-parallel serving readiness: the fused greedy-decode program runs
under Megatron-style TP shardings (parallel/tp.py) on a device mesh with
outputs identical to the replicated program.

The reference has no TP at all (SURVEY.md §2.9); for multi-chip TPU
serving of the 7B System-2 this is the scaling path — bf16-resident decode
over tp=2/4 ICI neighbors. Hardware here exposes one chip, so the mesh is
the 8-virtual-CPU-device mesh from conftest (the same validation substrate
the driver's dryrun_multichip uses)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    greedy_generate,
)
from internnav_tpu.parallel.tp import qwen_tp_sharding


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_tp_sharded_greedy_decode_matches_replicated():
    cfg = QwenTextConfig.tiny()
    model = QwenTextModel(cfg)
    B, T = 2, 10
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (B, T))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), pos,
                        method=model.init_all)["params"]
    embeds = model.apply({"params": params}, jnp.asarray(ids),
                         method=model.embed)

    def gen(p, e, po):
        return greedy_generate(model, p, e, po, max_new_tokens=6,
                               eos_token_ids=(3,))

    ref_tokens, ref_lengths = jax.jit(gen)(params, embeds, pos)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("tp",))
    shardings = qwen_tp_sharding(mesh, params)
    p_sharded = jax.device_put(params, shardings)
    repl = NamedSharding(mesh, P())
    tp_tokens, tp_lengths = jax.jit(
        gen, in_shardings=(shardings, repl, repl))(
        p_sharded, jax.device_put(embeds, repl), jax.device_put(pos, repl))

    np.testing.assert_array_equal(np.asarray(tp_tokens),
                                  np.asarray(ref_tokens))
    np.testing.assert_array_equal(np.asarray(tp_lengths),
                                  np.asarray(ref_lengths))
