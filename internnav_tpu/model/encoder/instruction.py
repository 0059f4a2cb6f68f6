"""Instruction encoders: GloVe-embedding RNN (Flax).

Reference: internnav/model/encoder/instruction_encoder.py:13-92 — embedding
(optionally loaded from a GloVe json.gz with PAD=0 zeros, UNK=1 mean) + a
uni/bidirectional LSTM/GRU over tokens; returns either the final state or
the full padded output sequence. The packed-sequence machinery is replaced
by the masked scan in internnav_tpu.ops.rnn (identical function).
"""

from __future__ import annotations

import gzip
import json
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from internnav_tpu.ops.rnn import (
    gru_encode_padded,
    lstm_encode_padded,
)


def load_glove_embeddings(path: str) -> np.ndarray:
    """Load the R2R GloVe embedding table (json.gz, rows = vocab)."""
    with gzip.open(path, "rt") as f:
        return np.asarray(json.load(f), dtype=np.float32)


class InstructionEncoder(nn.Module):
    """Token ids (B, L) → final state (B, H) or padded outputs (B, L, H).

    Lengths are derived from nonzero tokens (PAD=0), matching the reference
    (instruction_encoder.py:76).
    """

    vocab_size: int = 2504
    embedding_size: int = 50
    hidden_size: int = 128
    rnn_type: str = "LSTM"  # LSTM | GRU
    final_state_only: bool = True
    bidirectional: bool = False

    @property
    def output_size(self) -> int:
        return self.hidden_size * (2 if self.bidirectional else 1)

    def _rnn_params(self, prefix: str):
        n_gates = 3 if self.rnn_type == "GRU" else 4
        return {
            "w_ih": self.param(
                f"{prefix}w_ih", nn.initializers.lecun_normal(),
                (n_gates * self.hidden_size, self.embedding_size),
            ),
            "w_hh": self.param(
                f"{prefix}w_hh", nn.initializers.orthogonal(),
                (n_gates * self.hidden_size, self.hidden_size),
            ),
            "b_ih": self.param(f"{prefix}b_ih", nn.initializers.zeros,
                               (n_gates * self.hidden_size,)),
            "b_hh": self.param(f"{prefix}b_hh", nn.initializers.zeros,
                               (n_gates * self.hidden_size,)),
        }

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        tokens = tokens.astype(jnp.int32)
        lengths = jnp.sum((tokens != 0).astype(jnp.int32), axis=1)
        embed_table = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.vocab_size, self.embedding_size),
        )
        embedded = jnp.take(embed_table, jnp.clip(tokens, 0, self.vocab_size - 1), axis=0)

        encode = gru_encode_padded if self.rnn_type == "GRU" else lstm_encode_padded
        fwd = encode(self._rnn_params(""), embedded, lengths,
                     final_state_only=self.final_state_only)
        if not self.bidirectional:
            return fwd

        # backward direction: reverse each row within its valid length
        L = tokens.shape[1]
        pos = jnp.arange(L)[None, :]
        rev_idx = jnp.clip(lengths[:, None] - 1 - pos, 0, L - 1)
        rev = jnp.take_along_axis(embedded, rev_idx[..., None], axis=1)
        rev = rev * (pos < lengths[:, None])[..., None]
        bwd = encode(self._rnn_params("rev_"), rev, lengths,
                     final_state_only=self.final_state_only)
        if self.final_state_only:
            return jnp.concatenate([fwd, bwd], axis=-1)
        # un-reverse backward outputs to align per-token, pad stays zero
        bwd = jnp.take_along_axis(bwd, rev_idx[..., None], axis=1)
        bwd = bwd * (pos < lengths[:, None])[..., None]
        return jnp.concatenate([fwd, bwd], axis=-1)
