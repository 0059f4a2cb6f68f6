"""Full InternVLA-N1 checkpoint conversion: System-1 module parity.

The flagship's System-1 stack (NextDiT + MemoryEncoder + QFormer +
projections) must load from reference-format checkpoints
(internvla_n1_arch.py:120-144, nextdit_traj.py:181-368). Torch reference
modules are built in-test to the exact semantics of the reference's
dependencies (torch TransformerEncoder/Decoder defaults; diffusers 0.33
Lumina blocks re-implemented in plain torch from source), mirroring the
approach of tests/test_rdp_converters.py.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

from internnav_tpu.model.basemodel.internvla_n1.nextdit import (
    NextDiT,
    NextDiTConfig,
)
from internnav_tpu.model.weights.convert import (
    convert_memory_encoder,
    convert_nextdit,
    convert_qformer,
)


def _sd(module, prefix=""):
    return {prefix + k: v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


# --------------------------------------------------------------- memory/qformer
class TorchMemoryEncoder(tnn.Module):
    """internvla_n1_arch.py:76-95 verbatim semantics (torch defaults:
    post-norm, relu, ff 2048)."""

    def __init__(self, hidden_size=48, num_heads=4, num_layers=2, max_len=64):
        super().__init__()
        layer = tnn.TransformerEncoderLayer(
            d_model=hidden_size, nhead=num_heads, batch_first=True, dropout=0.0)
        self.encoder = tnn.TransformerEncoder(layer, num_layers=num_layers)
        self.memory_pos = tnn.Parameter(torch.randn(max_len, hidden_size))

    def forward(self, memory):
        B, N, C = memory.shape
        pos = self.memory_pos[:N].unsqueeze(0).expand(B, -1, -1)
        return self.encoder(memory + pos)


class TorchQFormer(tnn.Module):
    """internvla_n1_arch.py:97-118 verbatim semantics."""

    def __init__(self, num_query=4, hidden_size=48, num_layers=2, num_heads=4):
        super().__init__()
        self.query_tokens = tnn.Parameter(torch.randn(num_query, hidden_size))
        self.query_pos = tnn.Parameter(torch.randn(num_query, hidden_size))
        layer = tnn.TransformerDecoderLayer(
            d_model=hidden_size, nhead=num_heads, batch_first=True, dropout=0.0)
        self.decoder = tnn.TransformerDecoder(layer, num_layers=num_layers)
        self.visual_proj = tnn.Linear(hidden_size, hidden_size)  # unused

    def forward(self, visual_feats):
        B = visual_feats.size(0)
        q = self.query_tokens.unsqueeze(0).expand(B, -1, -1)
        q = q + self.query_pos.unsqueeze(0)
        return self.decoder(q, visual_feats)


def test_memory_encoder_converter_parity():
    torch.manual_seed(0)
    t = TorchMemoryEncoder().eval()
    x = torch.randn(2, 10, 48)
    with torch.no_grad():
        want = t(x).numpy()

    from internnav_tpu.model.basemodel.internvla_n1.model import MemoryEncoder

    flax_mod = MemoryEncoder(hidden_size=48, num_heads=4, num_layers=2,
                             max_len=64, dim_feedforward=2048)
    params = convert_memory_encoder(_sd(t, "model.memory_encoder."))
    got = flax_mod.apply({"params": params}, x.numpy())
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_qformer_converter_parity():
    torch.manual_seed(1)
    t = TorchQFormer().eval()
    feats = torch.randn(2, 6, 48)
    with torch.no_grad():
        want = t(feats).numpy()

    from internnav_tpu.model.basemodel.internvla_n1.model import QFormer

    flax_mod = QFormer(num_query=4, hidden_size=48, num_layers=2, num_heads=4,
                       dim_feedforward=2048)
    params = convert_qformer(_sd(t, "model.rgb_resampler."))
    got = flax_mod.apply({"params": params}, feats.numpy())
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


# ----------------------------------------------------------------- NextDiT
class TRMSNorm(tnn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + self.eps) * self.weight


class TLuminaRMSNormZero(tnn.Module):
    def __init__(self, dim, eps):
        super().__init__()
        self.linear = tnn.Linear(min(dim, 1024), 4 * dim)
        self.norm = TRMSNorm(dim, eps)

    def forward(self, x, emb):
        emb = self.linear(torch.nn.functional.silu(emb))
        s_msa, g_msa, s_mlp, g_mlp = emb.chunk(4, dim=1)
        return self.norm(x) * (1 + s_msa[:, None]), g_msa, s_mlp, g_mlp


class TAttention(tnn.Module):
    """diffusers Attention with qk_norm='layer_norm_across_heads',
    bias=False, out_bias=False, kv_heads == heads, no rotary."""

    def __init__(self, dim, heads, kv_dim=None, with_out=False):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(kv_dim or dim, dim, bias=False)
        self.to_v = tnn.Linear(kv_dim or dim, dim, bias=False)
        self.norm_q = tnn.LayerNorm(dim)
        self.norm_k = tnn.LayerNorm(dim)
        if with_out:
            self.to_out = tnn.ModuleList([tnn.Linear(dim, dim, bias=False)])

    def forward(self, x, kv):
        B, T, D = x.shape
        H = self.heads
        hd = D // H
        q = self.norm_q(self.to_q(x)).view(B, T, H, hd)
        k = self.norm_k(self.to_k(kv)).view(B, kv.shape[1], H, hd)
        v = self.to_v(kv).view(B, kv.shape[1], H, hd)
        s = torch.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
        p = s.softmax(-1)
        return torch.einsum("bhts,bshd->bthd", p, v)  # (B, T, H, hd)


class TLuminaFeedForward(tnn.Module):
    def __init__(self, dim, multiple_of):
        super().__init__()
        inner = int(2 * (4 * dim) / 3)
        inner = multiple_of * ((inner + multiple_of - 1) // multiple_of)
        self.linear_1 = tnn.Linear(dim, inner, bias=False)
        self.linear_2 = tnn.Linear(inner, dim, bias=False)
        self.linear_3 = tnn.Linear(dim, inner, bias=False)

    def forward(self, x):
        return self.linear_2(
            torch.nn.functional.silu(self.linear_1(x)) * self.linear_3(x))


class TLuminaBlock(tnn.Module):
    """nextdit_traj.py:39-178 forward semantics in plain torch."""

    def __init__(self, dim, heads, multiple_of, eps):
        super().__init__()
        self.gate = tnn.Parameter(torch.zeros(heads))
        self.attn1 = TAttention(dim, heads)
        self.attn2 = TAttention(dim, heads, kv_dim=dim, with_out=True)
        self.feed_forward = TLuminaFeedForward(dim, multiple_of)
        self.norm1 = TLuminaRMSNormZero(dim, eps)
        self.ffn_norm1 = TRMSNorm(dim, eps)
        self.norm2 = TRMSNorm(dim, eps)
        self.ffn_norm2 = TRMSNorm(dim, eps)
        self.norm1_context = TRMSNorm(dim, eps)

    def forward(self, x, cond, temb):
        res = x
        xn, g_msa, s_mlp, g_mlp = self.norm1(x, temb)
        self_out = self.attn1(xn, xn)
        cross = self.attn2(xn, self.norm1_context(cond))
        cross = cross * self.gate.tanh().view(1, 1, -1, 1)
        mixed = (self_out + cross).flatten(-2)
        h = self.attn2.to_out[0](mixed)
        x = res + g_msa.unsqueeze(1).tanh() * self.norm2(h)
        y = self.feed_forward(self.ffn_norm1(x) * (1 + s_mlp.unsqueeze(1)))
        return x + g_mlp.unsqueeze(1).tanh() * self.ffn_norm2(y)


class TTimeCaptionEmbed(tnn.Module):
    """diffusers LuminaCombinedTimestepCaptionEmbedding (0.33)."""

    def __init__(self, hidden, caption_dim, freq_dim=256):
        super().__init__()
        self.timestep_embedder = tnn.Module()
        self.timestep_embedder.linear_1 = tnn.Linear(freq_dim, hidden)
        self.timestep_embedder.linear_2 = tnn.Linear(hidden, hidden)
        self.caption_embedder = tnn.Sequential(
            tnn.LayerNorm(caption_dim), tnn.Linear(caption_dim, hidden))
        self.freq_dim = freq_dim

    def forward(self, t, captions, mask):
        half = self.freq_dim // 2
        exponent = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float) / half)
        ang = t.float()[:, None] * exponent[None]
        freqs = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)
        e = self.timestep_embedder.linear_2(
            torch.nn.functional.silu(self.timestep_embedder.linear_1(freqs)))
        m = mask.float().unsqueeze(-1)
        pooled = (captions * m).sum(1) / m.sum(1)
        return e + self.caption_embedder(pooled)


class TLuminaNextDiT(tnn.Module):
    """nextdit_traj.py:181-368 forward semantics (patch_embedder unused,
    image_rotary_emb None — exactly as the reference invokes it)."""

    def __init__(self, dim=32, layers=2, heads=4, multiple_of=16,
                 cross_dim=48, eps=1e-5):
        super().__init__()
        self.caption_projection = tnn.Module()
        self.caption_projection.linear_1 = tnn.Linear(cross_dim, dim)
        self.caption_projection.linear_2 = tnn.Linear(dim, dim)
        self.time_caption_embed = TTimeCaptionEmbed(min(dim, 1024), dim,
                                                    freq_dim=16)
        self.layers = tnn.ModuleList(
            [TLuminaBlock(dim, heads, multiple_of, eps) for _ in range(layers)])
        self.norm_out = tnn.Module()
        self.norm_out.linear_1 = tnn.Linear(min(dim, 1024), dim)
        self.norm_out.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x, t, z):
        c = self.caption_projection.linear_2(
            torch.nn.functional.gelu(
                self.caption_projection.linear_1(z), approximate="tanh"))
        mask = torch.ones(z.shape[0], z.shape[1])
        temb = self.time_caption_embed(t, c, mask)
        for layer in self.layers:
            x = layer(x, c, temb)
        scale = self.norm_out.linear_1(torch.nn.functional.silu(temb))
        x = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=1e-6)
        x = x * (1 + scale)[:, None]
        return self.norm_out.linear_2(x)


def test_nextdit_converter_parity():
    torch.manual_seed(2)
    t = TLuminaNextDiT().eval()
    B, T = 3, 8
    x = torch.randn(B, T, 32) * 0.5
    ts = torch.tensor([100.0, 500.0, 900.0])
    z = torch.randn(B, 5, 48) * 0.5
    with torch.no_grad():
        want = t(x, ts, z).numpy()

    cfg = NextDiTConfig(dim=32, n_layers=2, n_heads=4, n_kv_heads=4,
                        multiple_of=16, latent_embedding_size=48,
                        time_freq_dim=16, dtype=np.float32)
    flax_mod = NextDiT(cfg)
    params = convert_nextdit(_sd(t, "model.traj_dit.model."))
    got = flax_mod.apply({"params": params}, x.numpy(), ts.numpy(), z.numpy())
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def _build_tiny_checkpoint():
    """A tiny reference-format torch state dict + the matching flax config:
    HF tiny Qwen2.5-VL + System-1 modules at flax tiny dims."""
    pytest.importorskip("transformers")
    import jax.numpy as jnp

    from tests.test_weight_conversion import hf_tiny_qwen  # noqa: F401
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration)

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config, InternVLAN1Model)
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy)
    from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
        QwenTextConfig)
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
        QwenVisionConfig)
    from internnav_tpu.model.weights.convert import convert_internvla_n1

    # --- a torch "checkpoint": HF tiny Qwen + System-1 modules
    text_cfg = Qwen2_5_VLTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    vis_cfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        window_size=56, fullatt_block_indexes=[1], out_hidden_size=64)
    torch.manual_seed(3)
    hf = Qwen2_5_VLForConditionalGeneration(
        Qwen2_5_VLConfig(text_config=text_cfg.to_dict(),
                         vision_config=vis_cfg.to_dict())).eval()
    sd = {k: v.detach().to(torch.float32).numpy()
          for k, v in hf.state_dict().items()}

    # flax config matching the HF tiny dims, async nextdit System-1
    n_special = 6
    base = 512 - n_special
    cfg = InternVLAN1Config(
        text=QwenTextConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, mrope_section=(2, 3, 3), dtype=jnp.float32),
        vision=QwenVisionConfig.tiny(),
        system1="nextdit_async", n_query=2, predict_step_nums=8,
        image_token_index=base + 4, traj_token_index=base + 5)

    # System-1 torch modules at the flax tiny dims (rgb_dim 32, latent 48)
    torch.manual_seed(4)
    dit = TLuminaNextDiT().eval()  # dim 32 == NextDiTConfig.tiny().dim
    for k, v in _sd(dit, "model.traj_dit.model.").items():
        sd[k] = v
    sd["model.latent_queries"] = np.random.RandomState(0).randn(
        1, 2, 64).astype(np.float32)
    ae = tnn.Linear(3, 32)
    ad = tnn.Linear(32, 3)
    cp0 = tnn.Linear(64, 48)
    cp2 = tnn.Linear(48, 48)
    for mod, name in ((ae, "model.action_encoder"), (ad, "model.action_decoder"),
                      (cp0, "model.cond_projector.0"), (cp2, "model.cond_projector.2")):
        for k, v in _sd(mod, name + ".").items():
            sd[k] = v
    # DINOv2 trunk at tiny dims (2 blocks, dim 32) — synthesize a state
    # dict in DepthAnything naming
    from tests.test_weight_conversion import hf_tiny_qwen as _unused  # noqa

    rs = np.random.RandomState(7)

    def lin(k, din, dout, bias=True):
        sd[k + ".weight"] = rs.randn(dout, din).astype(np.float32) * 0.05
        if bias:
            sd[k + ".bias"] = rs.randn(dout).astype(np.float32) * 0.01

    pre = "model.rgb_model."
    sd[pre + "cls_token"] = rs.randn(1, 1, 32).astype(np.float32) * 0.02
    sd[pre + "pos_embed"] = rs.randn(1, 17, 32).astype(np.float32) * 0.02
    sd[pre + "patch_embed.proj.weight"] = rs.randn(32, 3, 14, 14).astype(np.float32) * 0.02
    sd[pre + "patch_embed.proj.bias"] = np.zeros(32, np.float32)
    for i in range(2):
        b = f"{pre}blocks.{i}."
        sd[b + "attn.qkv.weight"] = rs.randn(96, 32).astype(np.float32) * 0.05
        sd[b + "attn.qkv.bias"] = np.zeros(96, np.float32)
        lin(b + "attn.proj", 32, 32)
        for nrm in ("norm1", "norm2"):
            sd[b + nrm + ".weight"] = np.ones(32, np.float32)
            sd[b + nrm + ".bias"] = np.zeros(32, np.float32)
        lin(b + "mlp.fc1", 32, 128)
        lin(b + "mlp.fc2", 128, 32)
        sd[b + "ls1.gamma"] = np.full(32, 1e-5, np.float32)
        sd[b + "ls2.gamma"] = np.full(32, 1e-5, np.float32)
    sd[pre + "norm.weight"] = np.ones(32, np.float32)
    sd[pre + "norm.bias"] = np.zeros(32, np.float32)
    me = TorchMemoryEncoder(hidden_size=32, num_heads=4, num_layers=3,
                            max_len=512).eval()
    for k, v in _sd(me, "model.memory_encoder.").items():
        sd[k] = v
    qf = TorchQFormer(num_query=32, hidden_size=48, num_layers=3,
                      num_heads=4).eval()
    for k, v in _sd(qf, "model.rgb_resampler.").items():
        sd[k] = v
    return sd, cfg


def test_full_n1_assembly_smoke():
    """convert_internvla_n1 assembles a COMPLETE param tree whose structure
    and shapes match InternVLAN1Model.init at matching tiny dims, and the
    assembled tree runs generate_traj_nextdit."""
    import jax.numpy as jnp

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Model)
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy)
    from internnav_tpu.model.weights.convert import convert_internvla_n1

    sd, cfg = _build_tiny_checkpoint()
    model = InternVLAN1Model(cfg)
    ref_params = InternVLAN1Policy._init_params(model, cfg,
                                                jax.random.PRNGKey(0), 56)
    rs = np.random.RandomState(7)
    params = convert_internvla_n1(sd)

    # memory_proj exists ONLY in tiny configs whose dims don't line up
    # (2*rgb_dim != qformer width) — at full size the reference has no such
    # layer and neither do we; splice the init value for the tiny run
    assert "memory_proj" not in params
    params["memory_proj"] = ref_params["memory_proj"]

    # structure + shape equality with the flax init tree
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    mismatch = [
        (p, r, g) for (p, r), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(ref_shapes),
            jax.tree_util.tree_leaves_with_path(got_shapes)) if r != g]
    assert not mismatch, mismatch[:8]

    # the assembled tree must actually run the dual-system S1 path
    lat = jnp.asarray(rs.randn(1, 2, 64), jnp.float32)
    imgs = jnp.asarray(rs.rand(1, 2, 56, 56, 3), jnp.float32)
    dp = model.apply({"params": params}, lat, imgs,
                     rng=jax.random.PRNGKey(1), num_sample_trajs=2,
                     method=model.generate_traj_nextdit)
    assert np.asarray(dp).shape == (2, 8, 3)


def test_from_pretrained_torch_roundtrip(tmp_path):
    """InternVLAN1Policy.from_pretrained_torch loads a reference-format
    checkpoint directory (safetensors) end to end and runs an S2 step."""
    from safetensors.numpy import save_file

    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy)

    sd, cfg = _build_tiny_checkpoint()
    save_file(sd, str(tmp_path / "model.safetensors"))
    pol = InternVLAN1Policy.from_pretrained_torch(str(tmp_path), cfg)
    # splice the tiny-only memory_proj (absent from reference checkpoints)
    init = InternVLAN1Policy._init_params(pol.model, cfg,
                                          jax.random.PRNGKey(0), 56)
    pol.params = dict(pol.params)
    pol.params["memory_proj"] = init["memory_proj"]
    img = np.random.RandomState(0).randint(0, 255, (56, 56, 3)).astype(np.uint8)
    out = pol.s2_step(img, "go forward", max_new_tokens=3)
    assert out.validate()


def test_agent_loads_checkpoint_via_ckpt_path(tmp_path):
    """AgentCfg.ckpt_path routes the dual-system agents through
    from_pretrained_torch (reference eval-config UX: agents load their
    own checkpoints)."""
    from safetensors.numpy import save_file

    from internnav_tpu.agent import Agent
    from internnav_tpu.configs import AgentCfg

    sd, cfg = _build_tiny_checkpoint()
    save_file(sd, str(tmp_path / "model.safetensors"))
    agent = Agent.init(AgentCfg(
        model_name="internvla_n1_batched", ckpt_path=str(tmp_path),
        model_settings={"batch_size": 2, "config": cfg,
                        "max_new_tokens": 3, "num_sample_trajs": 2}))
    # memory_proj splice (tiny-only shim; absent from reference ckpts)
    inner = agent.policy.inner
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy)
    init = InternVLAN1Policy._init_params(inner.model, cfg,
                                          jax.random.PRNGKey(0), 56)
    inner.params = dict(inner.params)
    inner.params["memory_proj"] = init["memory_proj"]
    obs = [{"rgb": np.zeros((56, 56, 3), np.uint8),
            "instruction_text": "go forward"} for _ in range(2)]
    outs = agent.step(obs)
    assert len(outs) == 2 and all("action" in o for o in outs)
