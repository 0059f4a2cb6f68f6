"""Recurrent state encoders with episode-boundary masking (Flax).

TPU-native equivalent of the reference's RNNStateEncoder family
(internnav/model/encoder/rnn_encoder.py:220-384): the same module serves
single-step inference (x: (N, in)) and sequence training (x: (T, N, in))
— the packed-sequence path is replaced by a done-masked lax.scan.

State layout: (N, num_recurrent_layers, H) where LSTM packs (h, c) as two
consecutive layers (matching the reference's pack_hidden, rnn_encoder.py:337),
so agents can keep one homogeneous rnn_states tensor across policy types.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from internnav_tpu.ops.rnn import (
    gru_cell,
    lstm_cell,
    masked_gru_scan,
    masked_gru_step,
    masked_lstm_step,
)
import jax


class RNNStateEncoder(nn.Module):
    input_size: int
    hidden_size: int
    rnn_type: str = "GRU"  # GRU | LSTM (single layer, like every reference use)

    @property
    def num_recurrent_layers(self) -> int:
        return 1 if self.rnn_type == "GRU" else 2

    def _params(self):
        n_gates = 3 if self.rnn_type == "GRU" else 4
        return {
            "w_ih": self.param(
                "w_ih", nn.initializers.lecun_normal(),
                (n_gates * self.hidden_size, self.input_size),
            ),
            "w_hh": self.param(
                "w_hh", nn.initializers.orthogonal(),
                (n_gates * self.hidden_size, self.hidden_size),
            ),
            "b_ih": self.param("b_ih", nn.initializers.zeros, (n_gates * self.hidden_size,)),
            "b_hh": self.param("b_hh", nn.initializers.zeros, (n_gates * self.hidden_size,)),
        }

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, states: jnp.ndarray, masks: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, in) single step, or (T, N, in) sequence.
        states: (N, layers, H). masks: (N,) or (T, N); 0 = new episode.
        Returns (features, new_states) with features matching x's leading dims.
        """
        params = self._params()
        if self.rnn_type == "GRU":
            h = states[:, 0]
            if x.ndim == 2:
                h_new = masked_gru_step(params, x, h, masks)
                return h_new, h_new[:, None]
            ys, h_final = masked_gru_scan(params, x, h, masks)
            return ys, h_final[:, None]
        else:
            h, c = states[:, 0], states[:, 1]
            if x.ndim == 2:
                h_new, c_new = masked_lstm_step(params, x, (h, c), masks)
                return h_new, jnp.stack([h_new, c_new], axis=1)

            def step(carry, inp):
                x_t, m_t = inp
                m = m_t.reshape(-1, 1)
                hh, cc = carry
                new = lstm_cell(params, x_t, (hh * m, cc * m))
                return new, new[0]

            (h_f, c_f), ys = jax.lax.scan(step, (h, c), (x, masks))
            return ys, jnp.stack([h_f, c_f], axis=1)


def build_rnn_state_encoder(
    input_size: int, hidden_size: int, rnn_type: str = "GRU", **_
) -> RNNStateEncoder:
    """Factory with the reference's signature (rnn_encoder.py:364)."""
    return RNNStateEncoder(input_size=input_size, hidden_size=hidden_size,
                           rnn_type=rnn_type.upper())
