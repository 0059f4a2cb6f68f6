"""int8 KV-cache quantization (QwenTextConfig.kv_dtype='int8').

The int8 cache stores symmetric per-token-per-kv-head scales over head_dim
and is consumed WITHOUT dequantizing into a bf16 copy: k scales multiply
attention logits, v scales multiply probabilities (flash_attention.py
gqa_decode_attention). These tests pin:

- the scale-commuting attention math is EXACT: quant-aware attention over
  an int8 cache == dense attention over the dequantized cache;
- quantize_kv roundtrip error is bounded by scale/2 per element;
- greedy_generate / decode_chunk run end-to-end with kv_dtype='int8' and
  track the bf16-KV reference closely (hidden-state tolerance — token
  agreement on random weights is tie-break noise, see docs/benchmarks.md);
- grouped decode over int8 caches stays row-for-row identical to
  per-group decode (the serving invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    _cache_kvtd,
    _write_cache,
    _write_cache_chunk,
    greedy_generate,
    pad_caches,
    quantize_kv,
)
from internnav_tpu.ops.flash_attention import (
    gqa_chunk_decode_attention,
    gqa_decode_attention,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------- quantize
def test_quantize_kv_roundtrip_bound(rng):
    x = jnp.asarray(rng.randn(2, 7, 3, 16).astype(np.float32)) * 3.0
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 7, 3, 1)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_quantize_kv_zero_rows(rng):
    q, s = quantize_kv(jnp.zeros((1, 2, 1, 8)))
    assert np.asarray(q).sum() == 0 and np.isfinite(np.asarray(s)).all()


# ------------------------------------------------- scale-commuting is exact
def test_quant_decode_attention_exact_vs_dequant(rng):
    B, KV, G, T, D = 2, 2, 3, 32, 16
    q = jnp.asarray(rng.randn(B, KV * G, D).astype(np.float32))
    kv = jnp.asarray(rng.randn(2, B, T, KV, D).astype(np.float32))
    kq, ks = quantize_kv(kv[0])
    vq, vs = quantize_kv(kv[1])
    cache_len = jnp.asarray([T, T // 2])

    kd, ksc = _cache_kvtd((kq, ks))
    vd, vsc = _cache_kvtd((vq, vs))
    got = gqa_decode_attention(q, kd, vd, cache_len, k_scale=ksc, v_scale=vsc)

    # reference: dense attention over the explicitly dequantized cache
    k_deq = (kq.astype(jnp.float32) * ks).transpose(0, 2, 1, 3)
    v_deq = (vq.astype(jnp.float32) * vs).transpose(0, 2, 1, 3)
    want = gqa_decode_attention(q, k_deq, v_deq, cache_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_quant_chunk_decode_attention_exact_vs_dequant(rng):
    B, KV, G, T, D, n = 1, 2, 2, 24, 8, 3
    q = jnp.asarray(rng.randn(B, KV * G, n, D).astype(np.float32))
    kv = jnp.asarray(rng.randn(2, B, T, KV, D).astype(np.float32))
    kq, ks = quantize_kv(kv[0])
    vq, vs = quantize_kv(kv[1])
    cache_len = jnp.asarray([T - n])

    kd, ksc = _cache_kvtd((kq, ks))
    vd, vsc = _cache_kvtd((vq, vs))
    got = gqa_chunk_decode_attention(q, kd, vd, cache_len,
                                     k_scale=ksc, v_scale=vsc)
    k_deq = (kq.astype(jnp.float32) * ks).transpose(0, 2, 1, 3)
    v_deq = (vq.astype(jnp.float32) * vs).transpose(0, 2, 1, 3)
    want = gqa_chunk_decode_attention(q, k_deq, v_deq, cache_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


# -------------------------------------------------------- cache write paths
def test_write_cache_quant_entry(rng):
    B, T, KV, D = 3, 10, 2, 8
    entry = (jnp.zeros((B, T, KV, D), jnp.int8),
             jnp.zeros((B, T, KV, 1), jnp.float32))
    new = jnp.asarray(rng.randn(B, KV, D).astype(np.float32))
    pos = jnp.asarray([0, 4, 9])
    data, scale = _write_cache(entry, new, pos)
    assert data.dtype == jnp.int8
    for b in range(B):
        deq = (np.asarray(data[b, int(pos[b])], np.float32)
               * np.asarray(scale[b, int(pos[b])]))
        np.testing.assert_allclose(deq, np.asarray(new[b]), atol=0.05)


def test_write_cache_chunk_quant_entry(rng):
    B, T, KV, D, n = 2, 12, 2, 8, 3
    entry = (jnp.zeros((B, T, KV, D), jnp.int8),
             jnp.zeros((B, T, KV, 1), jnp.float32))
    new = jnp.asarray(rng.randn(B, n, KV, D).astype(np.float32))
    pos = jnp.asarray([2, 7])
    data, scale = _write_cache_chunk(entry, new, pos)
    for b in range(B):
        p = int(pos[b])
        deq = (np.asarray(data[b, p:p + n], np.float32)
               * np.asarray(scale[b, p:p + n]))
        np.testing.assert_allclose(deq, np.asarray(new[b]), atol=0.05)


def test_pad_caches_quant_entries(rng):
    B, T, KV, D = 1, 5, 2, 8
    k = jnp.asarray(rng.randn(B, T, KV, D).astype(np.float32))
    caches = [(quantize_kv(k), quantize_kv(k * 2))]
    out = pad_caches(caches, 9)
    (kq, ks), (vq, vs) = out[0]
    assert kq.shape == (B, 9, KV, D) and ks.shape == (B, 9, KV, 1)
    assert vq.shape == (B, 9, KV, D) and vs.shape == (B, 9, KV, 1)
    np.testing.assert_array_equal(np.asarray(kq[:, :T]),
                                  np.asarray(quantize_kv(k)[0]))


# --------------------------------------------------------------- end to end
def _tiny_models():
    cfg_bf = QwenTextConfig.tiny()
    import dataclasses

    cfg_q = dataclasses.replace(cfg_bf, kv_dtype="int8")
    return QwenTextModel(cfg_bf), QwenTextModel(cfg_q)


def test_greedy_generate_int8_kv_tracks_bf16(rng):
    model_bf, model_q = _tiny_models()
    cfg = model_bf.cfg
    B, T = 2, 12
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, T)))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T)).astype(jnp.int32)
    params = model_bf.init(jax.random.PRNGKey(0), ids, pos,
                           method=model_bf.init_all)["params"]
    embeds = model_bf.apply({"params": params}, ids, method=model_bf.embed)

    tok_bf, len_bf, caches_bf = greedy_generate(
        model_bf, params, embeds, pos, max_new_tokens=6,
        eos_token_ids=(cfg.vocab_size - 1,), return_caches=True)
    tok_q, len_q, caches_q = greedy_generate(
        model_q, params, embeds, pos, max_new_tokens=6,
        eos_token_ids=(cfg.vocab_size - 1,), return_caches=True)

    # structure: quant caches are ((int8, f32), (int8, f32)) per layer
    kq_entry = caches_q[0][0]
    assert isinstance(kq_entry, tuple) and kq_entry[0].dtype == jnp.int8
    assert caches_bf[0][0].ndim == 4  # bf16 path unchanged

    # random tiny weights produce near-tie logits, so token-for-token
    # agreement is not guaranteed — but the FIRST decode token comes from
    # the prefill logits (identical math both paths: prefill attention is
    # full-precision) and must match exactly
    np.testing.assert_array_equal(np.asarray(tok_bf[:, 0]),
                                  np.asarray(tok_q[:, 0]))
    assert tok_q.shape == tok_bf.shape and len_q.shape == len_bf.shape


def test_decode_step_hidden_close_int8_kv(rng):
    """One cached decode step: int8-KV hidden state stays within the
    quantization error envelope of the bf16-KV hidden state."""
    model_bf, model_q = _tiny_models()
    cfg = model_bf.cfg
    B, T = 2, 10
    embeds = jnp.asarray(rng.randn(B, T, cfg.hidden_size).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T)).astype(jnp.int32)
    params = model_bf.init(jax.random.PRNGKey(0), embeds, pos)["params"]

    # Draw the decode-step input ONCE, outside the per-model loop: both the
    # bf16-KV and int8-KV paths must see the *same* input or the comparison
    # below measures rng divergence, not quantization error (round-4 red tier).
    step = jnp.asarray(rng.randn(B, 1, cfg.hidden_size).astype(np.float32))

    outs = {}
    for name, model in (("bf", model_bf), ("q", model_q)):
        _, _, caches = model.apply({"params": params}, embeds, pos,
                                   return_cache=True)
        caches = pad_caches(caches, T + 4)
        pos1 = jnp.full((3, B, 1), T, jnp.int32)
        _, hidden, _ = model.apply(
            {"params": params}, step, pos1, caches, jnp.full((B,), T),
            compute_logits=False, method=model.decode_step)
        outs[name] = np.asarray(hidden, np.float32)
    ref = outs["bf"]
    scale = np.abs(ref).max()
    assert np.abs(outs["q"] - ref).max() <= 0.05 * scale + 1e-3


def test_grouped_decode_int8_kv_matches_pergroup(rng):
    """decode_step_grouped over int8 caches == per-group decode_step with
    int8 caches, row for row (the serving bit-parity invariant holds for
    the quantized cache too)."""
    _, model = _tiny_models()
    cfg = model.cfg
    Bs = [2, 3]
    T = 8
    params = None
    groups = []
    for B in Bs:
        embeds = jnp.asarray(rng.randn(B, T, cfg.hidden_size).astype(np.float32))
        pos = jnp.broadcast_to(jnp.arange(T)[None, None],
                               (3, B, T)).astype(jnp.int32)
        if params is None:
            params = model.init(jax.random.PRNGKey(0), embeds, pos)["params"]
        _, _, caches = model.apply({"params": params}, embeds, pos,
                                   return_cache=True)
        groups.append(pad_caches(caches, T + 4))

    step = jnp.asarray(rng.randn(sum(Bs), 1, cfg.hidden_size).astype(np.float32))
    pos1 = jnp.full((3, sum(Bs), 1), T, jnp.int32)
    lens = [jnp.full((B,), T, jnp.int32) for B in Bs]

    logits_g, hidden_g, _ = model.apply(
        {"params": params}, step, pos1, groups, lens,
        method=model.decode_step_grouped)

    r = 0
    for gi, B in enumerate(Bs):
        logits_s, hidden_s, _ = model.apply(
            {"params": params}, step[r:r + B], pos1[:, r:r + B], groups[gi],
            lens[gi], method=model.decode_step)
        np.testing.assert_allclose(np.asarray(logits_g[r:r + B]),
                                   np.asarray(logits_s), atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(hidden_g[r:r + B]),
                                   np.asarray(hidden_s), atol=2e-5, rtol=2e-5)
        r += B
