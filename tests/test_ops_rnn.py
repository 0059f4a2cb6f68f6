"""RNN ops vs torch ground truth (torch is CPU-only here, used as oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from internnav_tpu.ops import (
    gru_cell,
    gru_encode_padded,
    lstm_cell,
    masked_gru_scan,
)


def _torch_gru_params(input_size, hidden, seed=0):
    torch.manual_seed(seed)
    cell = torch.nn.GRU(input_size, hidden, num_layers=1)
    params = {
        "w_ih": jnp.asarray(cell.weight_ih_l0.detach().numpy()),
        "w_hh": jnp.asarray(cell.weight_hh_l0.detach().numpy()),
        "b_ih": jnp.asarray(cell.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh_l0.detach().numpy()),
    }
    return cell, params


def test_gru_cell_matches_torch(rng):
    cell, params = _torch_gru_params(6, 8)
    x = rng.standard_normal((4, 6)).astype(np.float32)
    h = rng.standard_normal((4, 8)).astype(np.float32)
    out_t, h_t = cell(torch.tensor(x)[None], torch.tensor(h)[None])
    ours = gru_cell(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ours), h_t[0].detach().numpy(), atol=1e-5)


def test_lstm_cell_matches_torch(rng):
    torch.manual_seed(1)
    tl = torch.nn.LSTM(5, 7, num_layers=1)
    params = {
        "w_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy()),
        "w_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy()),
        "b_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
    }
    x = rng.standard_normal((3, 5)).astype(np.float32)
    h = rng.standard_normal((3, 7)).astype(np.float32)
    c = rng.standard_normal((3, 7)).astype(np.float32)
    _, (h_t, c_t) = tl(torch.tensor(x)[None], (torch.tensor(h)[None], torch.tensor(c)[None]))
    h_j, c_j = lstm_cell(params, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t[0].detach().numpy(), atol=1e-5)


def test_masked_scan_resets_on_episode_boundary(rng):
    """A mask=0 step must behave as if the GRU started from h=0."""
    _, params = _torch_gru_params(4, 6, seed=2)
    T, N = 5, 3
    xs = rng.standard_normal((T, N, 4)).astype(np.float32)
    h0 = rng.standard_normal((N, 6)).astype(np.float32)
    masks = np.ones((T, N), np.float32)
    masks[2, 1] = 0.0  # env 1 starts a new episode at t=2

    ys, _ = masked_gru_scan(params, jnp.asarray(xs), jnp.asarray(h0), jnp.asarray(masks))

    # env 1 from t=2 should equal a fresh scan from zero state
    ys_fresh, _ = masked_gru_scan(
        params,
        jnp.asarray(xs[2:, 1:2]),
        jnp.zeros((1, 6), jnp.float32),
        jnp.ones((T - 2, 1), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(ys[2:, 1]), np.asarray(ys_fresh[:, 0]), atol=1e-6)
    # env 0 is unaffected by env 1's reset
    ys_noreset, _ = masked_gru_scan(
        params, jnp.asarray(xs), jnp.asarray(h0), jnp.ones((T, N), jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.asarray(ys_noreset[:, 0]), atol=1e-6)


def test_gru_encode_padded_matches_packed(rng):
    """Padded encode must equal torch pack_padded_sequence on ragged batches."""
    cell, params = _torch_gru_params(4, 6, seed=3)
    N, L = 3, 7
    lengths = np.array([7, 4, 2])
    x = rng.standard_normal((N, L, 4)).astype(np.float32)
    for i, l in enumerate(lengths):
        x[i, l:] = 0.0

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    out_packed, h_t = cell(packed)
    out_pad, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed, batch_first=True, total_length=L)

    h_final = gru_encode_padded(params, jnp.asarray(x), jnp.asarray(lengths), final_state_only=True)
    np.testing.assert_allclose(np.asarray(h_final), h_t[0].detach().numpy(), atol=1e-5)

    outs = gru_encode_padded(params, jnp.asarray(x), jnp.asarray(lengths), final_state_only=False)
    np.testing.assert_allclose(np.asarray(outs), out_pad.detach().numpy(), atol=1e-5)
