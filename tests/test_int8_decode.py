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


def test_grouped_scales_quantdense_parity():
    """Per-group(g) int8 scales (VERDICT r2 #3): QuantDense(group_size=g)
    matched with quantize_qwen_text_params_device(group_size=g) dequantizes
    at least as accurately as per-channel, and non-divisible input dims
    fall back to per-channel scales on both sides."""
    from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
        QuantDense,
        quantize_qwen_text_params_device,
    )

    rs = np.random.RandomState(3)
    K, N = 256, 32
    # outlier rows make grouped scales strictly better (LLM-weight-like)
    w = rs.randn(K, N).astype(np.float32) * 0.05
    w[7] *= 40.0
    w = jnp.asarray(w)
    x = jnp.asarray(rs.randn(4, K).astype(np.float32))
    ref = np.asarray(x @ w)

    deq_errs, fwd_errs = {}, {}
    for g in (None, 128):
        tree = quantize_qwen_text_params_device({"p": {"kernel": w}},
                                                group_size=g)["p"]
        expected_scale = (N,) if g is None else (K // g, N)
        assert tree["scale_q"].shape == expected_scale
        q = np.asarray(tree["kernel_q"], np.float32)
        s = np.asarray(tree["scale_q"])
        deq = q * s[None] if g is None else \
            (q.reshape(K // g, g, N) * s[:, None]).reshape(K, N)
        deq_errs[g] = float(np.abs(deq - np.asarray(w)).mean())
        m = QuantDense(N, use_bias=False, dtype=jnp.float32, group_size=g)
        y = m.apply({"params": {"kernel_q": tree["kernel_q"],
                                "scale_q": tree["scale_q"]}}, x)
        fwd_errs[g] = float(np.abs(np.asarray(y) - ref).max()
                            / np.abs(ref).max())
    # the outlier row coarsens every per-channel scale; grouped scales
    # confine it to its group (weight dequant fidelity strictly better)
    assert deq_errs[128] < deq_errs[None] * 0.6
    # full W8A8 forward stays close on both paths (activation quant noise
    # is shared and dominates)
    assert fwd_errs[128] < 0.08 and fwd_errs[None] < 0.08

    # fallback: g doesn't divide K -> per-channel shapes both sides
    w_odd = jnp.asarray(rs.randn(96, N).astype(np.float32) * 0.05)
    tree = quantize_qwen_text_params_device({"p": {"kernel": w_odd}},
                                            group_size=128)["p"]
    assert tree["scale_q"].shape == (N,)
    m = QuantDense(N, use_bias=False, dtype=jnp.float32, group_size=128)
    x_odd = jnp.asarray(rs.randn(2, 96).astype(np.float32))
    y = m.apply({"params": {"kernel_q": tree["kernel_q"],
                            "scale_q": tree["scale_q"]}}, x_odd)
    err = float(np.abs(np.asarray(y) - np.asarray(x_odd @ w_odd)).max()
                / np.abs(np.asarray(x_odd @ w_odd)).max())
    assert err < 0.05
