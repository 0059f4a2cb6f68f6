"""LongCLIP text encoder (Flax).

Parity target: reference internnav/model/encoder/
instruction_longCLIP_encoder.py:10-77 — the Long-CLIP text transformer
(beichenzbc/Long-CLIP) with its knowledge-preserving dual positional
embedding: the first `keep_len` positions use the original CLIP table
(mask1), the stretched remainder uses `positional_embedding_res` (mask2),
context length 248. Forward returns (full per-token embeds, valid mask,
EOT-pooled cls @ text_projection) — the surface CMA-CLIP/RDP consume.

Architecture = CLIP text trunk: token embedding, causal resblocks
(pre-LN, QuickGELU MLP), ln_final, EOT pooling at argmax(token id)
(the EOT token has the highest id in the CLIP vocab).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPResBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask):
        """x: (B, L, D)."""
        B, L, D = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * D, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.heads
        q = q.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5
        s = s + causal_mask[None, None]
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * D, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(D, name="c_proj")(h)
        return x


class LongCLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 248
    projection_dim: int = 512
    keep_len: int = 20  # Long-CLIP keeps the first 20 original positions

    @nn.compact
    def __call__(self, input_ids, txt_masks: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """input_ids (B, L<=248) int; right-padded with 0 to 248 like the
        reference (instruction_longCLIP_encoder.py:60-63).
        Returns (full (B, 248, width) fp32, mask (B, 248) bool, cls (B, proj))."""
        ids = input_ids.astype(jnp.int32)
        B, L = ids.shape
        ctx = self.context_length
        if L < ctx:
            ids = jnp.pad(ids, ((0, 0), (0, ctx - L)))
        if txt_masks is None:
            txt_masks = ids != 0

        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (ctx, self.width))
        pos_res = self.param("positional_embedding_res",
                             nn.initializers.normal(0.01), (ctx, self.width))
        keep = (jnp.arange(ctx) < self.keep_len)[:, None]
        x = tok + pos * keep + pos_res * (~keep)

        causal = jnp.triu(jnp.full((ctx, ctx), -jnp.inf), k=1)
        for i in range(self.layers):
            x = CLIPResBlock(self.width, self.heads, name=f"resblock_{i}")(
                x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.projection_dim))
        eot = jnp.argmax(ids, axis=-1)  # EOT has the highest vocab id
        cls = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0] @ proj
        return x.astype(jnp.float32), txt_masks, cls.astype(jnp.float32)


def convert_longclip_text(sd: Dict[str, np.ndarray],
                          prefix: str = "") -> Dict[str, Any]:
    """Long-CLIP checkpoint state dict → LongCLIPTextEncoder params.

    Source naming (Long-CLIP model.py / the reference's loaded
    text_transformer): token_embedding.weight, positional_embedding,
    positional_embedding_res, transformer.resblocks.N.{ln_1, attn.in_proj_
    weight/bias, attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj}, ln_final,
    text_projection.
    """
    from internnav_tpu.model.weights.convert import t_linear, unflatten

    p: Dict[str, np.ndarray] = {}
    g = lambda k: sd[prefix + k]  # noqa: E731
    p["token_embedding/embedding"] = g("token_embedding.weight")
    p["positional_embedding"] = g("positional_embedding")
    p["positional_embedding_res"] = g("positional_embedding_res")
    p["text_projection"] = g("text_projection")
    p["ln_final/scale"] = g("ln_final.weight")
    p["ln_final/bias"] = g("ln_final.bias")
    i = 0
    while f"{prefix}transformer.resblocks.{i}.ln_1.weight" in sd:
        src = f"{prefix}transformer.resblocks.{i}."
        dst = f"resblock_{i}/"
        p[dst + "ln_1/scale"] = sd[src + "ln_1.weight"]
        p[dst + "ln_1/bias"] = sd[src + "ln_1.bias"]
        p[dst + "ln_2/scale"] = sd[src + "ln_2.weight"]
        p[dst + "ln_2/bias"] = sd[src + "ln_2.bias"]
        p[dst + "in_proj/kernel"] = np.ascontiguousarray(
            sd[src + "attn.in_proj_weight"].T)
        p[dst + "in_proj/bias"] = sd[src + "attn.in_proj_bias"]
        t_linear(sd, src + "attn.out_proj", dst + "out_proj", p)
        t_linear(sd, src + "mlp.c_fc", dst + "c_fc", p)
        t_linear(sd, src + "mlp.c_proj", dst + "c_proj", p)
        i += 1
    return unflatten(p)
