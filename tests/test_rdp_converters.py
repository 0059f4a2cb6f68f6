"""Component-level conversion parity for the RDP stack: the roberta-style
LanguageEncoder, the BertCrossLayer cross-modal encoder, the CLIP visual
tower, DistanceNetwork heads, and the diffusion transformer — each against
a torch replica built with the reference's exact module naming."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# --------------------------------------------------------------- bert pieces
class _TorchBertAttention(tnn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.self = tnn.Module()
        self.self.query = tnn.Linear(hidden, hidden)
        self.self.key = tnn.Linear(hidden, hidden)
        self.self.value = tnn.Linear(hidden, hidden)
        self.output = tnn.Module()
        self.output.dense = tnn.Linear(hidden, hidden)
        self.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-5)
        self.heads = heads

    def forward(self, x, kv=None, mask=None):
        kv = x if kv is None else kv
        B, L, D = x.shape
        S = kv.shape[1]
        H = self.heads
        hd = D // H

        def split(t, n):
            return t.view(B, n, H, hd).permute(0, 2, 1, 3)

        q = split(self.self.query(x), L)
        k = split(self.self.key(kv), S)
        v = split(self.self.value(kv), S)
        s = q @ k.transpose(-1, -2) / np.sqrt(hd)
        if mask is not None:  # (B, S) True = valid
            s = s + (1.0 - mask.float())[:, None, None, :] * -10000.0
        p = s.softmax(-1)
        o = (p @ v).permute(0, 2, 1, 3).reshape(B, L, D)
        return self.output.LayerNorm(self.output.dense(o) + x)


class _TorchRobertaLayer(tnn.Module):
    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = _TorchBertAttention(hidden, heads)
        self.intermediate = tnn.Module()
        self.intermediate.dense = tnn.Linear(hidden, inter)
        self.output = tnn.Module()
        self.output.dense = tnn.Linear(inter, hidden)
        self.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-5)

    def forward(self, x, mask=None):
        x = self.attention(x, mask=mask)
        h = F.gelu(self.intermediate.dense(x))
        return self.output.LayerNorm(self.output.dense(h) + x)


class _TorchLanguageEncoder(tnn.Module):
    """Reference vendored LanguageEncoder naming + arange-position forward."""

    def __init__(self, vocab=300, hidden=32, heads=2, layers=2, inter=64,
                 max_pos=64):
        super().__init__()
        e = tnn.Module()
        e.word_embeddings = tnn.Embedding(vocab, hidden, padding_idx=1)
        e.position_embeddings = tnn.Embedding(max_pos, hidden)
        e.token_type_embeddings = tnn.Embedding(2, hidden)
        e.LayerNorm = tnn.LayerNorm(hidden, eps=1e-5)
        self.embeddings = e
        self.layer = tnn.ModuleList(
            [_TorchRobertaLayer(hidden, heads, inter) for _ in range(layers)])

    def forward(self, ids):
        mask = (ids != 1)
        pos = torch.arange(ids.shape[1])[None].expand_as(ids)
        x = (self.embeddings.word_embeddings(ids)
             + self.embeddings.position_embeddings(pos)
             + self.embeddings.token_type_embeddings(torch.zeros_like(ids)))
        x = self.embeddings.LayerNorm(x)
        for l in self.layer:
            x = l(x, mask)
        return x, mask, x[:, 0]


def test_bert_language_encoder_parity():
    from internnav_tpu.model.encoder.bert import LanguageEncoder
    from internnav_tpu.model.weights.convert import convert_bert_language_encoder

    torch.manual_seed(0)
    ref = _TorchLanguageEncoder().eval()
    params = convert_bert_language_encoder(_sd(ref))
    ids = np.array([[5, 9, 13, 20, 1, 1], [7, 4, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        t_full, t_mask, t_cls = ref(torch.tensor(ids))
    enc = LanguageEncoder(vocab_size=300, hidden_size=32, num_layers=2,
                          num_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    full, valid, cls = enc.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(valid), t_mask.numpy())
    np.testing.assert_allclose(np.asarray(full), t_full.numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cls), t_cls.numpy(),
                               atol=1e-5, rtol=1e-4)


class _TorchCrossLayer(tnn.Module):
    """BertCrossLayer naming (bert_backbone.py:706-716)."""

    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = _TorchBertAttention(hidden, heads)
        self.crossattention = _TorchBertAttention(hidden, heads)
        self.intermediate = tnn.Module()
        self.intermediate.dense = tnn.Linear(hidden, inter)
        self.output = tnn.Module()
        self.output.dense = tnn.Linear(inter, hidden)
        self.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-5)

    def forward(self, q, kv, kv_mask):
        x = self.attention(q)
        x = self.crossattention(x, kv, kv_mask)
        h = F.gelu(self.intermediate.dense(x))
        return self.output.LayerNorm(self.output.dense(h) + x)


class _TorchVLEncoder(tnn.Module):
    def __init__(self, hidden=32, heads=2, layers=2, inter=128):
        super().__init__()
        cme = tnn.Module()
        cme.crossattention = tnn.ModuleList(
            [_TorchCrossLayer(hidden, heads, inter) for _ in range(layers)])
        self.cross_modal_encoder = cme

    def forward(self, q, kv, kv_mask):
        for l in self.cross_modal_encoder.crossattention:
            q = l(q, kv, kv_mask)
        return q


def test_crossmodal_encoder_parity():
    from internnav_tpu.model.encoder.bert import VisionLanguageEncoder
    from internnav_tpu.model.weights.convert import convert_crossmodal_encoder

    torch.manual_seed(1)
    ref = _TorchVLEncoder().eval()
    params = convert_crossmodal_encoder(_sd(ref))
    rs = np.random.RandomState(0)
    q = rs.randn(2, 5, 32).astype(np.float32)
    kv = rs.randn(2, 7, 32).astype(np.float32)
    kv_mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0, 0]], bool)
    with torch.no_grad():
        want = ref(torch.tensor(q), torch.tensor(kv),
                   torch.tensor(kv_mask)).numpy()
    enc = VisionLanguageEncoder(hidden_size=32, num_heads=2, num_layers=2)
    got, _ = enc.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv),
                       None, jnp.asarray(kv_mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


# ------------------------------------------------------------- CLIP visual
def test_clip_visual_parity():
    import sys

    sys.path.insert(0, "tests")
    from test_longclip import _TorchCLIPText  # reuse resblock builder style
    from internnav_tpu.model.encoder.clip_vit import CLIPVisionTower
    from internnav_tpu.model.weights.convert import convert_clip_visual

    torch.manual_seed(2)
    width, heads, layers, patch, img = 32, 2, 2, 8, 32
    visual = tnn.Module()
    visual.conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
    visual.class_embedding = tnn.Parameter(torch.randn(width) * 0.1)
    n_tok = (img // patch) ** 2 + 1
    visual.positional_embedding = tnn.Parameter(torch.randn(n_tok, width) * 0.1)
    visual.ln_pre = tnn.LayerNorm(width)
    txt = _TorchCLIPText(width=width, heads=heads, layers=layers, ctx=4)
    visual.transformer = txt.transformer
    root = tnn.Module()
    root.visual = visual

    params = convert_clip_visual(_sd(root), "visual.")
    rs = np.random.RandomState(3)
    px = rs.randn(2, img, img, 3).astype(np.float32)

    with torch.no_grad():
        x = visual.conv1(torch.tensor(px).permute(0, 3, 1, 2))
        x = x.reshape(2, width, -1).permute(0, 2, 1)
        cls = visual.class_embedding + torch.zeros(2, 1, width)
        x = torch.cat([cls, x], dim=1) + visual.positional_embedding
        x = visual.ln_pre(x).permute(1, 0, 2)
        for b in visual.transformer.resblocks:
            h = b.ln_1(x)
            a, _ = b.attn(h, h, h, need_weights=False)
            x = x + a
            h = b.mlp.c_fc(b.ln_2(x))
            x = x + b.mlp.c_proj(h * torch.sigmoid(1.702 * h))
        want = x.permute(1, 0, 2).numpy()

    tower = CLIPVisionTower(width=width, layers=layers, heads=heads,
                            patch_size=patch)
    got = tower.apply({"params": params}, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


# --------------------------------------------------------- distance network
def test_distance_network_parity():
    from internnav_tpu.model.encoder.diffusion_transformer import DistanceNetwork
    from internnav_tpu.model.weights.convert import convert_distance_network

    torch.manual_seed(3)
    d = 64
    ref = tnn.Module()
    ref.network = tnn.Sequential(
        tnn.Linear(d, d // 4), tnn.ReLU(),
        tnn.Linear(d // 4, d // 16), tnn.ReLU(), tnn.Linear(d // 16, 1))
    params = convert_distance_network(_sd(ref), "")
    x = np.random.RandomState(0).randn(3, d).astype(np.float32)
    with torch.no_grad():
        want = torch.sigmoid(ref.network(torch.tensor(x))).numpy()
    got = DistanceNetwork(normalize=True).apply({"params": params},
                                                jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


# ------------------------------------------------------ diffusion transformer
class _TorchDiffusionTransformer(tnn.Module):
    """Reference TransformerForDiffusion naming (modified variant),
    obs-as-cond decoder config with a 1-layer cond TransformerEncoder."""

    def __init__(self, input_dim=3, output_dim=3, horizon=4, n_obs=5,
                 cond_dim=32, n_emb=32, n_layer=2, n_head=2):
        super().__init__()
        self.input_emb = tnn.Linear(input_dim, n_emb)
        self.pos_emb = tnn.Parameter(torch.zeros(1, horizon, n_emb))
        self.cond_obs_emb = tnn.Linear(cond_dim, n_emb)
        self.cond_pos_emb = tnn.Parameter(torch.zeros(1, n_obs + 1, n_emb))
        enc_layer = tnn.TransformerEncoderLayer(
            d_model=n_emb, nhead=n_head, dim_feedforward=4 * n_emb,
            activation="gelu", batch_first=True, norm_first=True, dropout=0.0)
        self.encoder = tnn.TransformerEncoder(enc_layer, num_layers=1)
        dec_layer = tnn.TransformerDecoderLayer(
            d_model=n_emb, nhead=n_head, dim_feedforward=4 * n_emb,
            activation="gelu", batch_first=True, norm_first=True, dropout=0.0)
        self.decoder = tnn.TransformerDecoder(dec_layer, num_layers=n_layer)
        self.ln_f = tnn.LayerNorm(n_emb)
        self.head = tnn.Linear(n_emb, output_dim)
        self.n_emb = n_emb
        self.horizon = horizon

    def time_emb(self, t):
        half = self.n_emb // 2
        freqs = torch.exp(-np.log(10000) * torch.arange(half) / (half - 1))
        ang = t[:, None].float() * freqs[None]
        return torch.cat([ang.sin(), ang.cos()], dim=-1)

    def forward(self, sample, timestep, cond):
        B, T, _ = sample.shape
        t = self.time_emb(timestep)[:, None]
        cond_tokens = torch.cat([t, self.cond_obs_emb(cond)], dim=1)
        x = cond_tokens + self.cond_pos_emb[:, : cond_tokens.shape[1]]
        memory = self.encoder(x)
        inp = self.input_emb(sample) + self.pos_emb[:, :T]
        Tc = memory.shape[1]
        tgt_mask = torch.full((T, T), float("-inf")).triu(1)
        tt = torch.arange(T)[:, None]
        ss = torch.arange(Tc)[None]
        mem_mask = torch.where(tt >= (ss - 1), 0.0, float("-inf"))
        out = self.decoder(inp, memory, tgt_mask=tgt_mask,
                           memory_mask=mem_mask)
        return self.head(self.ln_f(out))


def test_diffusion_transformer_parity():
    from internnav_tpu.model.encoder.diffusion_transformer import (
        TransformerForDiffusion,
    )
    from internnav_tpu.model.weights.convert import convert_diffusion_transformer

    torch.manual_seed(4)
    ref = _TorchDiffusionTransformer().eval()
    with torch.no_grad():
        ref.pos_emb.normal_(0, 0.1)
        ref.cond_pos_emb.normal_(0, 0.1)
    params = convert_diffusion_transformer(_sd(ref))
    rs = np.random.RandomState(5)
    sample = rs.randn(2, 4, 3).astype(np.float32)
    cond = rs.randn(2, 5, 32).astype(np.float32)
    t = np.array([3, 17], np.int64)
    with torch.no_grad():
        want = ref(torch.tensor(sample), torch.tensor(t),
                   torch.tensor(cond)).numpy()
    ours = TransformerForDiffusion(
        input_dim=3, output_dim=3, horizon=4, n_obs_steps=5, cond_dim=32,
        n_emb=32, n_layer=2, n_cond_layers=1, head_dim=16)
    got = ours.apply({"params": params}, jnp.asarray(sample), jnp.asarray(t),
                     jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)
