"""int8 weight-only decode path: quantized params load into the int8 model
and greedy generation tracks the bf16 model closely."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    greedy_generate,
    quantize_qwen_text_params,
)


def test_quantize_tree_and_forward_close():
    cfg = QwenTextConfig.tiny()
    model = QwenTextModel(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 2, 12
    ids = jax.random.randint(rng, (B, T), 0, cfg.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    params = model.init(rng, ids, pos, method=model.init_all)["params"]

    qcfg = dataclasses.replace(cfg, weight_dtype="int8")
    qmodel = QwenTextModel(qcfg)
    qparams = quantize_qwen_text_params(params)
    # structural check: projections became kernel_q + scale_q
    l0 = qparams["layers_0"]["self_attn"]["q_proj"]
    assert l0["kernel_q"].dtype == np.int8 and "scale_q" in l0
    assert "embedding" in qparams["embed_tokens"]  # embeddings untouched

    embeds = model.apply({"params": params}, ids, method=model.embed)
    logits, _, _ = model.apply({"params": params}, embeds, pos)
    qembeds = qmodel.apply({"params": qparams}, ids, method=qmodel.embed)
    qlogits, _, _ = qmodel.apply({"params": qparams}, qembeds, pos)
    # int8 weight-only should track bf16 closely at tiny depth
    ref = np.asarray(logits, np.float32)
    got = np.asarray(qlogits, np.float32)
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / denom < 0.08

    # greedy generation runs end to end on the int8 path
    toks, lengths = greedy_generate(
        qmodel, qparams, qembeds, pos, max_new_tokens=4,
        eos_token_ids=(cfg.vocab_size - 1,))
    assert toks.shape == (B, 4)
