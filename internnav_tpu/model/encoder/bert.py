"""RoBERTa-style text encoder + cross-modal encoders (Flax).

Parity targets in the reference:
- `LanguageEncoder` (instruction_roberta_encoder.py:6-32): RobertaEmbeddings
  + num_l_layers post-norm BERT layers; returns (per-token embeds, masks,
  cls embed); pad token id 1 (RoBERTa).
- `RobertaEmbeddings` (bert_backbone.py:241): word + learned positional
  embeddings where position ids start at pad_token_id+1 and skip pads
  (RoBERTa's create_position_ids_from_input_ids), + LayerNorm.
- `CrossmodalEncoder` / VisionLanguageEncoder (bert_backbone.py:706-830):
  stacked cross-attention layers (optional self-attn first), q from one
  modality, k/v from the other, post-norm.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from internnav_tpu.model.encoder.transformer import MultiHeadAttention


class RobertaEmbeddings(nn.Module):
    vocab_size: int = 50265
    hidden_size: int = 768
    max_position_embeddings: int = 514
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, input_ids):
        # the reference's vendored RobertaEmbeddings uses PLAIN arange
        # positions (bert_backbone.py:300-306: position_ids defaults to
        # arange, not RoBERTa's pad-skipping cumsum) and adds the type-0
        # token_type embedding — which conversion folds into the position
        # table (all type ids are 0)
        L = input_ids.shape[1]
        position_ids = jnp.broadcast_to(jnp.arange(L), input_ids.shape)
        words = nn.Embed(self.vocab_size, self.hidden_size, name="word_embeddings")(
            input_ids.astype(jnp.int32)
        )
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size,
                       name="position_embeddings")(position_ids)
        x = words + pos
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="LayerNorm")(x)


class BertLayer(nn.Module):
    """Post-norm BERT encoder layer (bert_backbone.py RobertaLayer:564)."""

    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        h, _ = MultiHeadAttention(self.hidden_size, self.num_heads, name="attention")(
            x, x, x, key_padding_mask
        )
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attn_ln")(x + h)
        y = nn.Dense(self.intermediate_size, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, name="output")(y)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="out_ln")(x + y)


class LanguageEncoder(nn.Module):
    """token ids (B, L) → (token embeds (B, L, H), valid mask (B, L), cls (B, H))."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    pad_token_id: int = 1
    max_position_embeddings: int = 514

    @nn.compact
    def __call__(self, input_ids) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        valid = input_ids != self.pad_token_id  # (B, L) True = real token
        x = RobertaEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            max_position_embeddings=self.max_position_embeddings,
            pad_token_id=self.pad_token_id, name="embeddings",
        )(input_ids)
        kpm = ~valid  # torch key_padding convention: True = masked out
        for i in range(self.num_layers):
            x = BertLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size, name=f"layer_{i}",
            )(x, kpm)
        return x, valid, x[:, 0, :]


class CrossModalLayer(nn.Module):
    """One cross-attention block: optional self-attn → cross-attn → FFN,
    post-norm (bert_backbone.py BertCrossLayer:706)."""

    hidden_size: int = 512
    num_heads: int = 8
    do_self_attn: bool = True

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, q_pad=None, kv_pad=None):
        x = q_tokens
        if self.do_self_attn:
            h, _ = MultiHeadAttention(self.hidden_size, self.num_heads, name="self_attn")(
                x, x, x, q_pad
            )
            x = nn.LayerNorm(epsilon=1e-5, name="self_ln")(x + h)
        h, probs = MultiHeadAttention(self.hidden_size, self.num_heads, name="cross_attn")(
            x, kv_tokens, kv_tokens, kv_pad
        )
        x = nn.LayerNorm(epsilon=1e-5, name="cross_ln")(x + h)
        y = nn.Dense(self.hidden_size * 4, name="intermediate")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_size, name="output")(y)
        x = nn.LayerNorm(epsilon=1e-5, name="out_ln")(x + y)
        return x, probs


class VisionLanguageEncoder(nn.Module):
    """Stack of CrossModalLayers; returns (fused q tokens, first-head
    cross-attn probs of the last layer) matching the reference's
    output_attentions path (rdp_policy.py:436-452)."""

    hidden_size: int = 512
    num_heads: int = 8
    num_layers: int = 2
    do_self_attn: bool = True

    @nn.compact
    def __call__(self, q_tokens, kv_tokens, q_valid=None, kv_valid=None):
        q_pad = None if q_valid is None else ~(q_valid.astype(bool))
        kv_pad = None if kv_valid is None else ~(kv_valid.astype(bool))
        probs = None
        x = q_tokens
        for i in range(self.num_layers):
            x, probs = CrossModalLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                do_self_attn=self.do_self_attn, name=f"layer_{i}",
            )(x, kv_tokens, q_pad, kv_pad)
        # probs: (B, H, Tq, Tkv) → first head
        return x, probs[:, 0]
