"""LongCLIP text encoder conversion + parity vs a torch Long-CLIP replica."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


class _TorchCLIPText(tnn.Module):
    """Long-CLIP text trunk with the reference's parameter naming
    (instruction_longCLIP_encoder.py:30-48 consumption path)."""

    def __init__(self, vocab=320, width=32, layers=2, heads=2, ctx=40,
                 proj=24, keep_len=4):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, width)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.1)
        self.positional_embedding_res = tnn.Parameter(
            torch.randn(ctx, width) * 0.1)
        self.register_buffer(
            "mask1", (torch.arange(ctx) < keep_len).float()[:, None])
        self.register_buffer(
            "mask2", (torch.arange(ctx) >= keep_len).float()[:, None])
        blocks = []
        for _ in range(layers):
            b = tnn.Module()
            b.ln_1 = tnn.LayerNorm(width)
            b.attn = tnn.MultiheadAttention(width, heads)
            b.ln_2 = tnn.LayerNorm(width)
            mlp = tnn.Module()
            mlp.c_fc = tnn.Linear(width, 4 * width)
            mlp.c_proj = tnn.Linear(4 * width, width)
            b.mlp = mlp
            blocks.append(b)
        tr = tnn.Module()
        tr.resblocks = tnn.ModuleList(blocks)
        self.transformer = tr
        self.ln_final = tnn.LayerNorm(width)
        self.text_projection = tnn.Parameter(torch.randn(width, proj) * 0.1)
        self.ctx = ctx

    def encode_text(self, text):
        x = self.token_embedding(text)
        x = (x + self.positional_embedding * self.mask1
             + self.positional_embedding_res * self.mask2)
        L = x.shape[1]
        mask = torch.full((L, L), float("-inf")).triu(1)
        x = x.permute(1, 0, 2)
        for b in self.transformer.resblocks:
            h = b.ln_1(x)
            a, _ = b.attn(h, h, h, need_weights=False, attn_mask=mask)
            x = x + a
            h = b.ln_2(x)
            h = b.mlp.c_fc(h)
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + b.mlp.c_proj(h)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        eot = text.argmax(dim=-1)
        cls = x[torch.arange(x.shape[0]), eot] @ self.text_projection
        return cls, x


def test_longclip_text_conversion_parity():
    from internnav_tpu.model.encoder.longclip import (
        LongCLIPTextEncoder,
        convert_longclip_text,
    )

    torch.manual_seed(0)
    ref = _TorchCLIPText().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_longclip_text(sd)

    enc = LongCLIPTextEncoder(vocab_size=320, width=32, layers=2, heads=2,
                              context_length=40, projection_dim=24, keep_len=4)
    rs = np.random.RandomState(0)
    ids = np.zeros((2, 40), np.int64)
    ids[0, :9] = list(rs.randint(2, 300, 8)) + [319]   # EOT = max id
    ids[1, :5] = list(rs.randint(2, 300, 4)) + [319]
    with torch.no_grad():
        t_cls, t_full = ref.encode_text(torch.tensor(ids))
    full, mask, cls = enc.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(full), t_full.numpy(),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cls), t_cls.numpy(),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(mask), ids != 0)

    # shorter input is right-padded to the context length (reference :60-63)
    full2, _, cls2 = enc.apply({"params": params}, jnp.asarray(ids[:, :12]))
    np.testing.assert_allclose(np.asarray(cls2), np.asarray(cls), atol=1e-5)


@pytest.mark.slow
def test_cma_clip_longclip_path_builds():
    from internnav_tpu.model import get_config, get_policy

    cfg = get_config("cma")
    cfg = cfg.model_copy(deep=True)
    cfg.text_encoder.model_name = "clip-long"
    cfg.text_encoder.vocab_size = 320
    cfg.text_encoder.hidden_size = 32
    cfg.text_encoder.num_l_layers = 2
    cfg.text_encoder.num_heads = 2
    cfg.text_encoder.max_length = 40
    pol = get_policy("cma_clip").build(cfg)
    obs = {
        "instruction": jnp.asarray(np.array([[5, 6, 319] + [0] * 13])),
        "rgb": jnp.zeros((1, 224, 224, 3), jnp.float32),
        "depth": jnp.zeros((1, 256, 256, 1), jnp.float32),
    }
    logits, states, prog = pol.forward({
        "observations": obs,
        "rnn_states": jnp.zeros((1, 2, cfg.state_encoder.hidden_size)),
        "prev_actions": jnp.zeros((1,), jnp.int32),
        "masks": jnp.ones((1,)),
        "mode": "train",
    })
    assert np.asarray(logits).shape == (1, 4)
    assert np.isfinite(np.asarray(logits)).all()
