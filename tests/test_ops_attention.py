"""Flash-attention kernel vs XLA reference (Pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from internnav_tpu.ops import (
    decode_attention,
    mha_reference,
    segment_ids_from_cu_seqlens,
)
from internnav_tpu.ops.flash_attention import _flash_forward


def _rand_qkv(rng, B=2, H=2, T=256, D=64, dtype=np.float32):
    q = rng.standard_normal((B, H, T, D)).astype(dtype)
    k = rng.standard_normal((B, H, T, D)).astype(dtype)
    v = rng.standard_normal((B, H, T, D)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _run_kernel(q, k, v, qs=None, ks=None, causal=False):
    with pltpu.force_tpu_interpret_mode():
        o, _ = _flash_forward(
            q, k, v, qs, ks, causal=causal,
            sm_scale=q.shape[-1] ** -0.5, block_q=128, block_k=128,
        )
    return o


def test_flash_full_attention(rng):
    q, k, v = _rand_qkv(rng)
    out = _run_kernel(q, k, v, causal=False)
    ref = mha_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_causal(rng):
    q, k, v = _rand_qkv(rng)
    out = _run_kernel(q, k, v, causal=True)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_segment_ids_packing(rng):
    """Packed sequences must not attend across segment boundaries."""
    B, H, T, D = 1, 2, 256, 64
    q, k, v = _rand_qkv(rng, B, H, T, D)
    cu = jnp.asarray([0, 100, 180, 256])
    seg = segment_ids_from_cu_seqlens(cu, T)[None]  # (1, T)
    out = _run_kernel(q, k, v, seg, seg, causal=True)
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)

    # cross-check segment isolation: perturbing segment 0 keys must not
    # change segment 2 outputs
    k2 = k.at[:, :, :100].add(10.0)
    out2 = _run_kernel(q, k2, v, seg, seg, causal=True)
    np.testing.assert_allclose(
        np.asarray(out[:, :, 180:]), np.asarray(out2[:, :, 180:]), atol=1e-5
    )


def test_flash_segment_ids_batched(rng):
    """Per-row segment masks at batch > 1 (the bucketed batched-serving
    layout: each row pads to a shared length with pad-isolating segments).
    Regression: (B, T) segment ids with (1, block) BlockSpecs only lowered
    on TPU when B == 1; the kernel now carries them as (B, 1, T)."""
    B, H, T, D = 3, 2, 256, 64
    q, k, v = _rand_qkv(rng, B, H, T, D)
    seg = np.zeros((B, T), np.int32)
    seg[0, 200:] = 1   # row 0: pad tail isolated
    seg[1, 128:] = 1   # row 1: different boundary
    # row 2: no pads
    seg = jnp.asarray(seg)
    out = _run_kernel(q, k, v, seg, seg, causal=True)
    ref = mha_reference(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_flash_backward_parity_packed_batched(rng):
    _grad_parity(rng, causal=True, packed=True, T=256, B=3)


def test_segment_ids_from_cu_seqlens():
    seg = segment_ids_from_cu_seqlens(jnp.asarray([0, 3, 5, 8]), 8)
    np.testing.assert_array_equal(np.asarray(seg), [0, 0, 0, 1, 1, 2, 2, 2])


def test_decode_attention_matches_full(rng):
    """Decode with a cache equals the last row of full causal attention."""
    B, H, T, D = 2, 2, 64, 32
    q, k, v = _rand_qkv(rng, B, H, T, D)
    full = mha_reference(q, k, v, causal=True)
    Tmax = 80
    k_cache = jnp.zeros((B, H, Tmax, D)).at[:, :, :T].set(k)
    v_cache = jnp.zeros((B, H, Tmax, D)).at[:, :, :T].set(v)
    out = decode_attention(q[:, :, -1], k_cache, v_cache, jnp.full((B,), T))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(full[:, :, -1]), atol=2e-3, rtol=2e-3
    )


def test_flash_backward_runs(rng):
    q, k, v = _rand_qkv(rng, 1, 1, 128, 32)

    def loss(q, k, v):
        # CPU fallback path is the reference; grads flow through custom_vjp
        from internnav_tpu.ops import flash_attention

        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def _grad_parity(rng, *, causal, packed, T=256, B=1, H=2, D=64, dtype=np.float32,
                 atol=2e-2):
    """Tiled Pallas backward vs XLA-reference vjp."""
    from internnav_tpu.ops.flash_attention import (
        _flash_attention,
        mha_reference,
    )

    q, k, v = _rand_qkv(rng, B, H, T, D, dtype)
    if packed:
        cu = jnp.asarray([0, T // 3, T // 2, T])
        seg = segment_ids_from_cu_seqlens(cu, T)[None]
        seg = jnp.broadcast_to(seg, (B, T))
    else:
        seg = None
    sm = D ** -0.5

    def pallas_loss(q, k, v):
        o = _flash_attention(q, k, v, seg, seg, causal, sm, 128, 128)
        return jnp.sum((o.astype(jnp.float32) * 1e-1) ** 2)

    def ref_loss(q, k, v):
        o = mha_reference(q, k, v, causal=causal, segment_ids=seg,
                          kv_segment_ids=seg, sm_scale=sm)
        return jnp.sum((o.astype(jnp.float32) * 1e-1) ** 2)

    if jax.default_backend() == "cpu":
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(pallas_loss, argnums=(0, 1, 2))(q, k, v)
    else:
        got = jax.jit(jax.grad(pallas_loss, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=atol, rtol=2e-3, err_msg=f"d{name}")


def test_flash_backward_parity_causal(rng):
    _grad_parity(rng, causal=True, packed=False)


def test_flash_backward_parity_full(rng):
    _grad_parity(rng, causal=False, packed=False)


def test_flash_backward_parity_packed_causal(rng):
    _grad_parity(rng, causal=True, packed=True, T=384)


@pytest.mark.tpu
@pytest.mark.parametrize("T", [4096, 8192])
def test_flash_backward_parity_long_packed(rng, T):
    """Gradient parity at training lengths (real TPU only; the XLA reference
    materializes (T, T) here, the Pallas path must not)."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU (interpret mode too slow at 4k+)")
    _grad_parity(rng, causal=True, packed=True, T=T, H=2, dtype=np.float32,
                 atol=5e-2)


def test_gqa_decode_matches_repeat(rng):
    """GQA decode (no KV repeat) must equal repeat-then-decode."""
    from internnav_tpu.ops.flash_attention import gqa_decode_attention

    B, KV, G, T, D = 2, 2, 3, 32, 16
    H = KV * G
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, 40, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, 40, D)), jnp.float32)
    lens = jnp.asarray([T, T - 5])
    ref = decode_attention(q, jnp.repeat(k, G, axis=1), jnp.repeat(v, G, axis=1), lens)
    got = gqa_decode_attention(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
