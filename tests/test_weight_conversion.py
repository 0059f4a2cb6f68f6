"""Weight-conversion parity tests against live torch references.

These are the golden-parity checks SURVEY.md §4 calls for: convert real
torch weights and require numerical agreement of the forward pass.
- Qwen2.5-VL text decoder vs HF transformers (logits parity)
- Qwen2.5-VL vision tower vs HF transformers (token parity)
- torchvision ResNet18 spatial features parity
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from internnav_tpu.model.weights.convert import (
    convert_qwen25vl_text,
    convert_qwen25vl_vision,
    convert_torchvision_resnet,
)


def _torch_sd_to_numpy(module):
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def hf_tiny_qwen():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLTextConfig,
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    text_cfg = Qwen2_5_VLTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=1000000.0,
        rms_norm_eps=1e-6,  # released Qwen2.5-VL-7B value (HF default is 1e-5)
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        tie_word_embeddings=False,
    )
    vis_cfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        window_size=56, fullatt_block_indexes=[1], out_hidden_size=64,
        hidden_act="silu",
    )
    cfg = Qwen2_5_VLConfig(text_config=text_cfg.to_dict(),
                           vision_config=vis_cfg.to_dict())
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model


def test_qwen_text_logits_parity(hf_tiny_qwen):
    from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
        QwenTextConfig,
        QwenTextModel,
    )

    hf = hf_tiny_qwen
    sd = _torch_sd_to_numpy(hf)
    params = convert_qwen25vl_text(sd)

    cfg = QwenTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, mrope_section=(2, 3, 3), dtype=jnp.float32,
    )
    model = QwenTextModel(cfg)

    B, T = 2, 12
    ids = np.random.RandomState(0).randint(0, 512, (B, T))
    with torch.no_grad():
        # HF text model expects 3D mrope position ids
        pos_t = torch.arange(T)[None, None].expand(3, B, T)
        hf_out = hf.model.language_model(
            input_ids=torch.tensor(ids), position_ids=pos_t,
        ).last_hidden_state
        hf_logits = hf.lm_head(hf_out).numpy()

    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=model.embed)
    logits, _, _ = model.apply({"params": params}, embeds, pos)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4, rtol=2e-3)


def test_qwen_vision_tokens_parity(hf_tiny_qwen):
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
        QwenVisionConfig,
        QwenVisionTower,
        encode_images,
    )

    hf = hf_tiny_qwen
    sd = _torch_sd_to_numpy(hf)
    params = convert_qwen25vl_vision(sd)
    cfg = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64,
        dtype=jnp.float32,
    )
    tower = QwenVisionTower(cfg)

    img = np.random.RandomState(1).randint(0, 255, (1, 56, 56, 3)).astype(np.uint8)

    ours, grid = encode_images(tower, params, img)

    # HF path: same normalization + patching
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073])
    std = np.asarray([0.26862954, 0.26130258, 0.27577711])
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import preprocess_images

    norm = ((img.astype(np.float32) / 255.0) - mean) / std
    patches, grid_thw = preprocess_images(norm.astype(np.float32), cfg)
    with torch.no_grad():
        hf_tokens = hf.model.visual(
            torch.tensor(patches, dtype=torch.float32),
            grid_thw=torch.tensor(grid_thw),
        ).numpy()
    np.testing.assert_allclose(np.asarray(ours), hf_tokens, atol=3e-4, rtol=3e-3)


def _torch_resnet18():
    """Minimal torchvision-compatible ResNet18 (torchvision isn't installed;
    same module/parameter naming so real checkpoints convert identically)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    class R18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            chans = [64, 64, 128, 256, 512]
            for li, blocks in enumerate([2, 2, 2, 2]):
                stride = 1 if li == 0 else 2
                layer = nn.Sequential(
                    BasicBlock(chans[li], chans[li + 1], stride),
                    BasicBlock(chans[li + 1], chans[li + 1]),
                )
                setattr(self, f"layer{li + 1}", layer)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            return x

    return R18()


def test_torchvision_resnet18_parity():
    from internnav_tpu.model.encoder.resnet import TorchVisionResNet

    torch.manual_seed(0)
    tv = _torch_resnet18().eval()
    # randomize BN stats so frozen-BN conversion is actually exercised
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    sd = _torch_sd_to_numpy(tv)
    params = convert_torchvision_resnet(sd, "resnet18")

    rgb = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.tensor(rgb / 255.0).permute(0, 3, 1, 2).float()
        feats = tv(x)
        ref = torch.nn.functional.adaptive_avg_pool2d(feats, (4, 4))
        ref = ref.permute(0, 2, 3, 1).reshape(1, 16, -1).numpy()

    module = TorchVisionResNet(version="resnet18", spatial_output=True)
    full = {"params": dict(params)}
    # spatial embeddings are ours-only; init then merge converted weights
    init = module.init(jax.random.PRNGKey(0), jnp.asarray(rgb))["params"]
    from internnav_tpu.model.base import merge_params

    merged = merge_params(init, full["params"])
    out = module.apply({"params": merged}, jnp.asarray(rgb))
    ours = np.asarray(out)[..., :ref.shape[-1]]  # drop spatial-embedding dims
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
