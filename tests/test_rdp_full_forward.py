"""Full RDP forward parity: converted weights + our RDPNet conditioning
stack must reproduce the reference pred_actions pipeline's predicted
epsilon for a fixed (noisy action, timestep) — covering text encoder, CLIP
visual multi-patch fusion, depth tower, GRU, both cross encoders, the
condition/type-embedding assembly, and the diffusion transformer
(rdp_policy.py:364-560 wiring)."""

import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

from test_longclip import _TorchCLIPText  # noqa: E402
from test_policy_converters import TorchDepthEncoder, _gru_step  # noqa: E402
from test_rdp_converters import (  # noqa: E402
    _TorchBertAttention,
    _TorchDiffusionTransformer,
    _TorchLanguageEncoder,
)


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


class _TorchCrossLayerQ(tnn.Module):
    """BertCrossLayer with q-side self-attention masking (the txt→img
    direction masks text pads in its self-attention)."""

    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = _TorchBertAttention(hidden, heads)
        self.crossattention = _TorchBertAttention(hidden, heads)
        self.intermediate = tnn.Module()
        self.intermediate.dense = tnn.Linear(hidden, inter)
        self.output = tnn.Module()
        self.output.dense = tnn.Linear(inter, hidden)
        self.output.LayerNorm = tnn.LayerNorm(hidden, eps=1e-5)

    def forward(self, q, kv, q_mask=None, kv_mask=None):
        x = self.attention(q, mask=q_mask)
        x = self.crossattention(x, kv, kv_mask)
        h = F.gelu(self.intermediate.dense(x))
        return self.output.LayerNorm(self.output.dense(h) + x)


class _TorchVL(tnn.Module):
    def __init__(self, hidden, heads, layers, inter):
        super().__init__()
        cme = tnn.Module()
        cme.crossattention = tnn.ModuleList(
            [_TorchCrossLayerQ(hidden, heads, inter) for _ in range(layers)])
        self.cross_modal_encoder = cme

    def forward(self, q, kv, q_mask=None, kv_mask=None):
        for l in self.cross_modal_encoder.crossattention:
            q = l(q, kv, q_mask, kv_mask)
        return q


class TorchRDP(tnn.Module):
    """Reference RDPNet replica (roberta text path) with exact naming."""

    def __init__(self, cfg):
        super().__init__()
        H = cfg.state_encoder.hidden_size
        self.H = H
        self.instruction_encoder = _TorchLanguageEncoder(
            vocab=cfg.text_encoder.vocab_size, hidden=H, heads=2,
            layers=cfg.text_encoder.num_l_layers, inter=4 * H, max_pos=514)
        img = tnn.Module()
        it = tnn.Module()
        vis = tnn.Module()
        width, patch = getattr(cfg, "vit_width", 768), 16
        vis.conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
        vis.class_embedding = tnn.Parameter(torch.randn(width) * 0.02)
        vis.positional_embedding = tnn.Parameter(
            torch.randn((224 // patch) ** 2 + 1, width) * 0.02)
        vis.ln_pre = tnn.LayerNorm(width)
        vis.transformer = _TorchCLIPText(width=width, heads=12,
                                         layers=cfg.vit_layers, ctx=4).transformer
        it.visual = vis
        img.image_transformer = it
        img.img_learnable_linear = tnn.Linear(width, H)
        img.depth_learnable_linear = tnn.Linear(width, H)
        img.depth_encoder = TorchDepthEncoder(spatial=True)
        img.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(3072, width), tnn.ReLU(True))
        self.image_encoder = img
        self.img_txt_cross_encoder = _TorchVL(
            H, 2, cfg.cross_modal_encoder.num_x_layers, 4 * H)
        self.txt_img_cross_encoder = _TorchVL(H, 2, 2, 4 * H)
        se = tnn.Module()
        se.rnn = tnn.GRU(5 * H + 64 + 64, H)
        self.state_encoder = se
        self.prev_action_embedding = tnn.Linear(3, 64)
        self.prev_action_embedding_dp = tnn.Linear(3, H)
        self.imu_linear = tnn.Linear(3, 64)
        self.imu_linear_dp = tnn.Linear(3, H)
        for head in ("progress_monitor", "stop_progress_predictor"):
            m = tnn.Module()
            d = 2 * H
            m.network = tnn.Sequential(
                tnn.Linear(d, d // 4), tnn.ReLU(),
                tnn.Linear(d // 4, d // 16), tnn.ReLU(),
                tnn.Linear(d // 16, 1))
            setattr(self, head, m)
        dp = cfg.diffusion_policy
        n_obs = 5 + 1 + 1 + 1 + 1 + cfg.len_traj_act
        self.action_dp_pred_net = _TorchDPWithTypes(
            input_dim=3, output_dim=3, horizon=dp.len_traj_pred, n_obs=n_obs,
            cond_dim=H, n_emb=dp.n_emb, n_layer=dp.n_layer,
            n_head=max(1, dp.n_emb // 64))
        self.action_type_embeds = tnn.Embedding(10, dp.n_emb)

    def _encode_image(self, rgb_uint8, depth):
        """embed_image multi-patch path (image_clip_encoder.py:218-259,
        380-409): CLIP normalize → CLS + 2x2 quadrant pooled tokens →
        img_learnable_linear; depth tower fused onto token 0."""
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711])
        px = (rgb_uint8.float() / 255.0 - mean) / std
        vis = self.image_encoder.image_transformer.visual
        x = vis.conv1(px.permute(0, 3, 1, 2))
        B, W, h, w = x.shape
        x = x.reshape(B, W, -1).permute(0, 2, 1)
        x = torch.cat([vis.class_embedding.expand(B, 1, W), x], dim=1)
        x = vis.ln_pre(x + vis.positional_embedding).permute(1, 0, 2)
        for b in vis.transformer.resblocks:
            hn = b.ln_1(x)
            a, _ = b.attn(hn, hn, hn, need_weights=False)
            x = x + a
            hn = b.mlp.c_fc(b.ln_2(x))
            x = x + b.mlp.c_proj(hn * torch.sigmoid(1.702 * hn))
        x = x.permute(1, 0, 2)  # (B, 1+P, W)
        grid = int(np.sqrt(x.shape[1] - 1))
        pf = x[:, 1:].reshape(B, grid, grid, W).permute(0, 3, 1, 2)
        pooled = F.avg_pool2d(pf, grid // 2, grid // 2)
        pooled = pooled.reshape(B, W, 4).permute(0, 2, 1)
        five = torch.cat([x[:, :1], pooled], dim=1)  # (B, 5, W)
        img_tokens = self.image_encoder.img_learnable_linear(five)

        d = self.image_encoder.depth_encoder(depth)       # (B, 192, 4, 4)
        d = torch.flatten(d, 2)                           # (B, 192, 16)
        d = self.image_encoder.depth_linear(d)            # (B, 768)
        img_tokens[:, 0] = img_tokens[:, 0] + \
            self.image_encoder.depth_learnable_linear(d)
        return img_tokens                                 # (B, 5, H)

    def predict_eps(self, obs, rnn_states, prev_actions, masks, x, t):
        text, txt_masks, _ = self.instruction_encoder(obs["instruction"])
        prev = prev_actions.float() * masks[:, None, None].float()
        prev_emb = self.prev_action_embedding(prev)
        prev_dp = self.prev_action_embedding_dp(prev)
        latest = prev_emb[:, 0]
        rgbd = self._encode_image(obs["rgb"], obs["depth"])
        imu_emb = self.imu_linear(obs["imu"])
        imu_dp = self.imu_linear_dp(obs["imu"])
        concat = torch.cat([torch.flatten(rgbd, 1), latest, imu_emb], dim=1)
        h = rnn_states[:, 0:1].permute(1, 0, 2)
        state, _ = _gru_step(self.state_encoder.rnn, concat, h, masks)
        state = state.unsqueeze(1)
        vis_state = torch.cat([rgbd, state], dim=1)
        img_txt = self.img_txt_cross_encoder(vis_state, text,
                                             kv_mask=txt_masks)
        txt_img = self.txt_img_cross_encoder(text, vis_state,
                                             q_mask=txt_masks)
        txt_dp = txt_img[:, 0:1]
        lv_state = torch.cat([img_txt, txt_dp, state,
                              imu_dp.unsqueeze(1), prev_dp], dim=1)
        type_ids = ([0] * img_txt.shape[1] + [1] + [2] + [4]
                    + [5] * prev_dp.shape[1])
        type_embeds = self.action_type_embeds(
            torch.tensor(type_ids)).unsqueeze(0).repeat(x.shape[0], 1, 1)
        return self.action_dp_pred_net(x, t, lv_state.float(), type_embeds)


class _TorchDPWithTypes(_TorchDiffusionTransformer):
    """Adds the reference's type-embedding injection (modified
    TransformerForDiffusion: cond_obs_emb output + type_embeds)."""

    def forward(self, sample, timestep, cond, type_embeds):
        B, T, _ = sample.shape
        t = self.time_emb(timestep)[:, None]
        cond_tokens = torch.cat(
            [t, self.cond_obs_emb(cond) + type_embeds], dim=1)
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


@pytest.mark.slow
def test_rdp_full_forward_epsilon_parity():
    from test_diffusion_models import tiny_rdp_cfg
    from internnav_tpu.model import get_policy
    from internnav_tpu.model.weights.convert import convert_rdp_policy

    cfg = tiny_rdp_cfg()
    cfg.text_encoder.model_name = "roberta"
    torch.manual_seed(0)
    ref = TorchRDP(cfg).eval()
    params = convert_rdp_policy(_sd(ref))

    pol = get_policy("rdp").build(cfg)
    from internnav_tpu.model.base import merge_params

    pol.params = merge_params(pol.params, params)

    rs = np.random.RandomState(1)
    B = 2
    H = cfg.state_encoder.hidden_size
    ids = np.full((B, 20), 1, np.int64)  # roberta pad = 1
    ids[0, :12] = rs.randint(2, 900, 12)
    ids[1, :7] = rs.randint(2, 900, 7)
    obs = {
        "instruction": ids,
        "rgb": rs.randint(0, 255, (B, 224, 224, 3)).astype(np.float32),
        "depth": rs.uniform(0, 1, (B, 256, 256, 1)).astype(np.float32),
        "imu": rs.randn(B, 3).astype(np.float32),
    }
    rnn_states = rs.randn(B, 1, H).astype(np.float32)
    prev_actions = rs.randn(B, cfg.len_traj_act, 3).astype(np.float32)
    masks = np.ones((B,), np.float32)
    x = rs.randn(B, cfg.diffusion_policy.len_traj_pred, 3).astype(np.float32)
    t = np.array([7, 3], np.int64)

    with torch.no_grad():
        want = ref.predict_eps(
            {k: torch.tensor(v) for k, v in obs.items()},
            torch.tensor(rnn_states), torch.tensor(prev_actions),
            torch.tensor(masks), torch.tensor(x), torch.tensor(t)).numpy()

    def ours(module):
        cond, type_embeds, _, _, _, _, _ = module._conditioning(
            {k: jnp.asarray(v) for k, v in obs.items()},
            jnp.asarray(rnn_states), jnp.asarray(prev_actions),
            jnp.asarray(masks))
        return module.action_dp_pred_net(jnp.asarray(x), jnp.asarray(t),
                                         cond, type_embeds, None)

    got = pol.module.apply({"params": pol.params}, method=ours)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=2e-2)
