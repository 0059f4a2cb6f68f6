"""Recurrent cells and done-masked sequence scanning.

TPU-first replacement for the reference's packed-sequence RNN machinery
(internnav/model/encoder/rnn_encoder.py: _build_pack_info_from_dones:24-136,
build_rnn_inputs:137, RNNStateEncoder.seq_forward:280-303). On TPU, ragged
packed sequences are hostile to XLA; instead we run a dense `lax.scan` over
the time axis and reset the carry wherever the step mask is 0 (episode
boundary). This computes exactly the same function: for masked steps the
hidden state entering the cell is zero, which is what "start of a new
episode" means in the reference.

Cells are pure functions over explicit parameter pytrees laid out with the
torch gate order (GRU: r,z,n; LSTM: i,f,g,o) so reference checkpoints map
weight-for-weight.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ------------------------------------------------------------------ params
def init_gru_params(key, input_size: int, hidden_size: int) -> Params:
    """Torch-layout GRU params: w_ih (3H, in), w_hh (3H, H), b_ih, b_hh."""
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    return {
        "w_ih": u(k1, (3 * hidden_size, input_size)),
        "w_hh": u(k2, (3 * hidden_size, hidden_size)),
        "b_ih": u(k3, (3 * hidden_size,)),
        "b_hh": u(k4, (3 * hidden_size,)),
    }


def init_lstm_params(key, input_size: int, hidden_size: int) -> Params:
    k = 1.0 / math.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -k, k)
    return {
        "w_ih": u(k1, (4 * hidden_size, input_size)),
        "w_hh": u(k2, (4 * hidden_size, hidden_size)),
        "b_ih": u(k3, (4 * hidden_size,)),
        "b_hh": u(k4, (4 * hidden_size,)),
    }


# ------------------------------------------------------------------- cells
def gru_cell(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step, torch semantics. x: (N, in), h: (N, H) → (N, H)."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell(
    params: Params, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step, torch gate order (i, f, g, o). Returns (h, c)."""
    h, c = state
    gates = x @ params["w_ih"].T + params["b_ih"] + h @ params["w_hh"].T + params["b_hh"]
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H : 2 * H])
    g = jnp.tanh(gates[..., 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


# ------------------------------------------- masked single-step / sequence
def masked_gru_step(
    params: Params, x: jnp.ndarray, h: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Single env step: zero the carry where mask==0 (new episode), then step.

    Matches RNNStateEncoder.single_forward's `hidden_states * masks`
    (rnn_encoder.py:255-270). mask: (N,) or (N, 1) of {0., 1.}.
    """
    mask = mask.reshape(h.shape[0], 1).astype(h.dtype)
    return gru_cell(params, x, h * mask)


def masked_lstm_step(params, x, state, mask):
    h, c = state
    mask = mask.reshape(h.shape[0], 1).astype(h.dtype)
    return lstm_cell(params, x, (h * mask, c * mask))


def masked_gru_scan(
    params: Params, xs: jnp.ndarray, h0: jnp.ndarray, masks: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan a GRU over time with per-step episode-boundary masking.

    xs: (T, N, in); h0: (N, H); masks: (T, N) — 0 marks the first step of a
    new episode (reference convention: `not_done_masks`).
    Returns (outputs (T, N, H), final hidden (N, H)).
    """

    def step(h, inp):
        x_t, m_t = inp
        h_new = masked_gru_step(params, x_t, h, m_t)
        return h_new, h_new

    h_final, ys = jax.lax.scan(step, h0, (xs, masks))
    return ys, h_final


def masked_lstm_scan(params, xs, state0, masks):
    def step(state, inp):
        x_t, m_t = inp
        new = masked_lstm_step(params, x_t, state, m_t)
        return new, new[0]

    final, ys = jax.lax.scan(step, state0, (xs, masks))
    return ys, final


# ------------------------------------------------- variable-length encoder
def gru_encode_padded(
    params: Params, embedded: jnp.ndarray, lengths: jnp.ndarray,
    final_state_only: bool = True,
):
    """Encode padded (N, L, E) sequences, replacing pack_padded_sequence
    (reference instruction_encoder.py:82-92).

    Positions >= length do not advance the hidden state (carry is frozen),
    so the final carry equals the hidden state at the last valid token and
    padded outputs are zeroed — identical to packed-RNN + pad_packed output.
    """
    N, L, _ = embedded.shape
    xs = jnp.swapaxes(embedded, 0, 1)  # (L, N, E)
    t_idx = jnp.arange(L)[:, None]  # (L, 1)
    valid = (t_idx < lengths[None, :]).astype(embedded.dtype)  # (L, N)

    def step(h, inp):
        x_t, v_t = inp
        h_new = gru_cell(params, x_t, h)
        v = v_t[:, None]
        h_keep = v * h_new + (1.0 - v) * h
        return h_keep, h_new * v[..., : 1]

    h0 = jnp.zeros((N, params["w_hh"].shape[-1]), embedded.dtype)
    h_final, ys = jax.lax.scan(step, h0, (xs, valid))
    if final_state_only:
        return h_final
    return jnp.swapaxes(ys, 0, 1)  # (N, L, H), padded positions zero


def lstm_encode_padded(params: Params, embedded: jnp.ndarray, lengths: jnp.ndarray,
                       final_state_only: bool = True):
    N, L, _ = embedded.shape
    H = params["w_hh"].shape[-1]
    xs = jnp.swapaxes(embedded, 0, 1)
    t_idx = jnp.arange(L)[:, None]
    valid = (t_idx < lengths[None, :]).astype(embedded.dtype)

    def step(state, inp):
        x_t, v_t = inp
        h, c = state
        h_new, c_new = lstm_cell(params, x_t, (h, c))
        v = v_t[:, None]
        return (v * h_new + (1 - v) * h, v * c_new + (1 - v) * c), h_new * v

    state0 = (jnp.zeros((N, H), embedded.dtype), jnp.zeros((N, H), embedded.dtype))
    (h_final, _), ys = jax.lax.scan(step, state0, (xs, valid))
    if final_state_only:
        return h_final
    return jnp.swapaxes(ys, 0, 1)
