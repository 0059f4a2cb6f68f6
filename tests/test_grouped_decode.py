"""Grouped decode parity: decoding several prefill cohorts in one program
(one decoder weight stream) must be row-for-row identical to per-cohort
`greedy_generate` / `decode_chunk`."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    greedy_decode_grouped,
    greedy_generate,
    pad_caches,
)

MNT = 6
N_Q = 3


def _prefill(model, params, ids, extra):
    """Replicates greedy_generate's prefill stage: returns
    (first_tok, padded caches, prompt_lengths, rope_deltas)."""
    B, T = ids.shape
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    embeds = model.apply({"params": params}, ids, method=model.embed)
    prompt_len = jnp.full((B,), T, jnp.int32)
    logits, _, caches = model.apply(
        {"params": params}, embeds, pos, return_cache=True,
        logits_indices=prompt_len - 1)
    caches = pad_caches(caches, T + extra)
    first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
    deltas = pos.max(axis=(0, 2)) + 1 - T
    return first, caches, prompt_len, deltas.astype(jnp.int32)


@pytest.mark.slow
def test_grouped_greedy_matches_per_group():
    # slow tier: the grouped-decode while_loop compiles dominate (~40 s);
    # the same parity also runs e2e in test_serving_shared_decode
    cfg = QwenTextConfig.tiny()
    model = QwenTextModel(cfg)
    rng = jax.random.PRNGKey(2)
    ids_a = jax.random.randint(rng, (2, 9), 0, cfg.vocab_size)
    ids_b = jax.random.randint(jax.random.PRNGKey(3), (3, 12), 0,
                               cfg.vocab_size)
    pos_a = jnp.broadcast_to(jnp.arange(9)[None, None], (3, 2, 9))
    params = model.init(rng, ids_a, pos_a, method=model.init_all)["params"]
    eos = (int(jax.random.randint(jax.random.PRNGKey(9), (), 0,
                                  cfg.vocab_size)),)

    # reference: per-group greedy_generate (prefill + decode fused)
    ref = {}
    for name, ids in (("a", ids_a), ("b", ids_b)):
        B, T = ids.shape
        pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
        e = model.apply({"params": params}, ids, method=model.embed)
        toks, lens, caches = greedy_generate(
            model, params, e, pos, max_new_tokens=MNT, eos_token_ids=eos,
            return_caches=True, extra_cache_slots=N_Q)
        ref[name] = (np.asarray(toks), np.asarray(lens), caches)

    # grouped: separate prefills, one shared decode
    fa, ca, pla, da = _prefill(model, params, ids_a, MNT + N_Q)
    fb, cb, plb, db = _prefill(model, params, ids_b, MNT + N_Q)
    toks, lens, trees = greedy_decode_grouped(
        model, params, jnp.concatenate([fa, fb]), [ca, cb],
        prompt_lengths=jnp.concatenate([pla, plb]),
        rope_deltas=jnp.concatenate([da, db]),
        max_new_tokens=MNT, eos_token_ids=eos)
    toks = np.asarray(toks)
    lens = np.asarray(lens)

    np.testing.assert_array_equal(toks[:2], ref["a"][0])
    np.testing.assert_array_equal(toks[2:], ref["b"][0])
    np.testing.assert_array_equal(lens[:2], ref["a"][1])
    np.testing.assert_array_equal(lens[2:], ref["b"][1])

    # grouped latents chunk over the post-decode caches == per-group chunk
    q = jnp.asarray(
        np.random.RandomState(0).randn(1, N_Q, cfg.hidden_size) * 0.02,
        jnp.float32)

    def chunk_ref(name, B, caches, pl, lens_g, deltas):
        e = jnp.broadcast_to(q, (B, N_Q, cfg.hidden_size))
        pos1 = (pl + deltas + lens_g)[None, :, None] + jnp.arange(N_Q)[None, None]
        pos = jnp.broadcast_to(pos1, (3, B, N_Q)).astype(jnp.int32)
        hid, _ = model.apply({"params": params}, e, pos, caches,
                             pl + lens_g, method=model.decode_chunk)
        return np.asarray(hid, np.float32)

    ra = chunk_ref("a", 2, ref["a"][2], pla, jnp.asarray(ref["a"][1]), da)
    rb = chunk_ref("b", 3, ref["b"][2], plb, jnp.asarray(ref["b"][1]), db)

    pl = jnp.concatenate([pla, plb])
    dl = jnp.concatenate([da, db])
    lens_j = jnp.asarray(lens)
    e = jnp.broadcast_to(q, (5, N_Q, cfg.hidden_size))
    pos1 = (pl + dl + lens_j)[None, :, None] + jnp.arange(N_Q)[None, None]
    pos = jnp.broadcast_to(pos1, (3, 5, N_Q)).astype(jnp.int32)
    hid, _ = model.apply(
        {"params": params}, e, pos, trees,
        [pl[:2] + lens_j[:2], pl[2:] + lens_j[2:]],
        method=model.decode_chunk_grouped)
    hid = np.asarray(hid, np.float32)
    np.testing.assert_allclose(hid[:2], ra, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(hid[2:], rb, atol=2e-5, rtol=2e-5)
