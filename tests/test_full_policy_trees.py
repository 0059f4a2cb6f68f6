"""Full RDP / NavDP checkpoint conversion: DINOv2 forward parity plus
strict structural compatibility of the converted trees against the real
flax init trees (every converted leaf must exist with the same shape, and
coverage must be high — catches naming/transpose/shape drift)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# ----------------------------------------------------------- DINOv2 replica
class _TorchDinoBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.heads = heads

    def forward(self, x):
        B, L, D = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).view(B, L, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        s = (q @ k.transpose(-1, -2)) / np.sqrt(D // self.heads)
        o = (s.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(B, L, D)
        x = x + self.ls1.gamma * self.attn.proj(o)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * h


class _TorchDino(tnn.Module):
    """DINOv2 trunk with the DepthAnythingV2 `.pretrained` naming."""

    def __init__(self, dim=16, depth=2, heads=2, patch=7, img=14, in_ch=3):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2 + 1
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        pe = tnn.Module()
        pe.proj = tnn.Conv2d(in_ch, dim, patch, patch)
        self.patch_embed = pe
        self.blocks = tnn.ModuleList(
            [_TorchDinoBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, px):  # (B, H, W, C)
        x = self.patch_embed.proj(px.permute(0, 3, 1, 2))
        B, D, h, w = x.shape
        x = x.reshape(B, D, h * w).permute(0, 2, 1)
        x = torch.cat([self.cls_token.expand(B, 1, D), x], dim=1)
        x = x + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.norm(x)[:, 1:]


def test_dinov2_trunk_forward_parity():
    from internnav_tpu.model.encoder.vit import DinoViT
    from internnav_tpu.model.weights.convert import convert_dinov2_vits

    torch.manual_seed(0)
    ref = _TorchDino().eval()
    params = convert_dinov2_vits(_sd(ref), prefix="")
    px = np.random.RandomState(1).randn(2, 14, 14, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(px)).numpy()
    vit = DinoViT(dim=16, depth=2, heads=2, patch_size=7)
    got = vit.apply({"params": params}, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


# ----------------------------------------------------- tree compatibility
def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat(v, key))
        else:
            out[key] = np.shape(v)
    return out


def _assert_tree_compatible(converted, init, min_coverage, allow_missing=()):
    conv, ini = _flat(converted), _flat(init)
    unknown = [k for k in conv if k not in ini]
    assert not unknown, f"converted keys missing from the model: {unknown[:8]}"
    bad = [(k, conv[k], ini[k]) for k in conv if conv[k] != ini[k]]
    assert not bad, f"shape mismatches: {bad[:8]}"
    cover = len(conv) / len(ini)
    missing = [k for k in ini if k not in conv
               and not any(k.startswith(a) for a in allow_missing)]
    assert cover >= min_coverage, (
        f"coverage {cover:.2f} < {min_coverage}; examples missing: {missing[:10]}")
    return cover


@pytest.mark.slow
def test_navdp_full_conversion_tree():
    """Torch NavDP with reference naming at tiny dims → convert → every leaf
    lands in our NavDPNet tree with the right shape."""
    from internnav_tpu.model import get_config, get_policy
    from internnav_tpu.model.weights.convert import convert_navdp_policy

    cfg = get_config("navdp")
    cfg.memory_size, cfg.predict_size, cfg.temporal_depth = 2, 6, 1
    s = 14  # one 14px patch per frame keeps the DINOv2 towers cheap
    pol = get_policy("navdp").build(cfg, image_size=s)

    torch.manual_seed(1)
    D = 384  # the trunks are full ViT-S dims regardless of image size

    class LearnablePE(tnn.Module):
        def __init__(self, dim, n):
            super().__init__()
            self.position_embedding = tnn.Embedding(n, dim)

    def decoder(layers, norm_first):
        layer = tnn.TransformerDecoderLayer(
            d_model=D, nhead=2, dim_feedforward=4 * D, activation="gelu",
            batch_first=True, norm_first=norm_first, dropout=0.0)
        return tnn.TransformerDecoder(layer, num_layers=layers)

    ref = tnn.Module()
    rgbd = tnn.Module()
    rgbd.rgb_model = _TorchDino(dim=D, depth=12, heads=6, patch=14, img=s)
    rgbd.depth_model = _TorchDino(dim=D, depth=12, heads=6, patch=14, img=s)
    rgbd.former_query = tnn.Embedding(cfg.memory_size * 16, D)
    rgbd.former_pe = tnn.Embedding(2 * cfg.memory_size * 256, D)
    rgbd.former_net = decoder(2, norm_first=False)
    rgbd.project_layer = tnn.Linear(D, D)
    ref.rgbd_encoder = rgbd
    for enc, tname, ch in (("pixel_encoder", "pixelgoal_encoder", 7),
                           ("image_encoder", "imagegoal_encoder", 6)):
        sub = tnn.Module()
        setattr(sub, tname,
                _TorchDino(dim=D, depth=12, heads=6, patch=14, img=s, in_ch=ch))
        sub.project_layer = tnn.Linear(D, D)
        setattr(ref, enc, sub)
    ref.point_encoder = tnn.Linear(3, D)
    ref.decoder = decoder(cfg.temporal_depth, norm_first=True)
    ref.input_embed = tnn.Linear(3, D)
    ref.cond_pos_embed = LearnablePE(D, cfg.memory_size * 16 + 4)
    ref.out_pos_embed = LearnablePE(D, cfg.predict_size)
    ref.layernorm = tnn.LayerNorm(D)
    ref.action_head = tnn.Linear(D, 3)
    ref.critic_head = tnn.Linear(D, 1)
    ref.pixel_aux_head = tnn.Linear(D, 3)
    ref.image_aux_head = tnn.Linear(D, 3)

    converted = convert_navdp_policy(_sd(ref))
    cover = _assert_tree_compatible(converted, pol.params, min_coverage=0.95)
    # and the merged params actually run
    from internnav_tpu.model.base import merge_params

    pol.params = merge_params(pol.params, converted)
    traj, critic = pol.forward({
        "mode": "pointgoal",
        "sample_num": 2,
        "rng": jax.random.PRNGKey(0),
        "observations": {
            "goal_point": jnp.ones((1, 3)),
            "input_images": jnp.zeros((1, cfg.memory_size, s, s, 3)),
            "input_depths": jnp.zeros((1, cfg.memory_size, s, s, 1)),
        },
    })
    assert np.isfinite(np.asarray(traj)).all()


@pytest.mark.slow
def test_rdp_full_conversion_tree():
    """Torch RDP (roberta text path) with reference naming at tiny dims →
    convert → structural compatibility with our RDPNet tree."""
    import sys

    sys.path.insert(0, "tests")
    from test_diffusion_models import tiny_rdp_cfg
    from test_policy_converters import TorchDepthEncoder
    from test_rdp_converters import (
        _TorchDiffusionTransformer,
        _TorchLanguageEncoder,
        _TorchVLEncoder,
    )
    from test_longclip import _TorchCLIPText
    from internnav_tpu.model import get_policy
    from internnav_tpu.model.weights.convert import convert_rdp_policy

    cfg = tiny_rdp_cfg()
    cfg.text_encoder.model_name = "roberta"
    pol = get_policy("rdp").build(cfg)
    H = cfg.state_encoder.hidden_size  # 64

    torch.manual_seed(2)
    ref = tnn.Module()
    ref.instruction_encoder = _TorchLanguageEncoder(
        vocab=cfg.text_encoder.vocab_size, hidden=H, heads=2,
        layers=cfg.text_encoder.num_l_layers, inter=4 * H, max_pos=514)
    # image encoder: CLIP visual (OpenAI naming) + projections + depth tower
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
    ref.image_encoder = img
    ref.img_txt_cross_encoder = _TorchVLEncoder(
        hidden=H, heads=2, layers=cfg.cross_modal_encoder.num_x_layers,
        inter=4 * H)
    ref.txt_img_cross_encoder = _TorchVLEncoder(hidden=H, heads=2, layers=2,
                                                inter=4 * H)
    se = tnn.Module()
    rnn_in = 5 * H + 64 + 64
    se.rnn = tnn.GRU(rnn_in, H)
    ref.state_encoder = se
    ref.prev_action_embedding = tnn.Linear(3, 64)
    ref.prev_action_embedding_dp = tnn.Linear(3, H)
    ref.imu_linear = tnn.Linear(3, 64)
    ref.imu_linear_dp = tnn.Linear(3, H)
    for head in ("progress_monitor", "stop_progress_predictor"):
        m = tnn.Module()
        d = 2 * H
        m.network = tnn.Sequential(
            tnn.Linear(d, d // 4), tnn.ReLU(),
            tnn.Linear(d // 4, d // 16), tnn.ReLU(), tnn.Linear(d // 16, 1))
        setattr(ref, head, m)
    dp = cfg.diffusion_policy
    n_obs = 5 + 1 + 1 + 1 + 1 + cfg.len_traj_act
    ref.action_dp_pred_net = _TorchDiffusionTransformer(
        input_dim=3, output_dim=3, horizon=dp.len_traj_pred, n_obs=n_obs,
        cond_dim=H, n_emb=dp.n_emb, n_layer=dp.n_layer, n_head=2)
    ref.action_type_embeds = tnn.Embedding(10, dp.n_emb)

    converted = convert_rdp_policy(_sd(ref))
    _assert_tree_compatible(converted, pol.params, min_coverage=0.9)
