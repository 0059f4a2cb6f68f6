"""Torch → Flax weight conversion for the model zoo.

Covers the reference checkpoint formats (SURVEY.md §5.4: HF-format dirs of
safetensors / pytorch_model.bin with tolerant partial loading):
- Qwen2.5-VL (System-2): HF `Qwen2_5_VLForConditionalGeneration` state
  dict → internnav_tpu QwenTextModel + QwenVisionTower param trees;
- torchvision ResNets (CMA/Seq2Seq RGB towers);
- DD-PPO GroupNorm ResNet (depth towers);
- DINOv2 ViT-S (DepthAnything trunks);
- generic torch GRU/LSTM/Linear/Conv layers.

Conventions: torch Linear (out, in) → flax kernel (in, out); torch Conv2d
(O, I, kh, kw) → flax (kh, kw, I, O); RNN gate layouts already match the
torch order (ops/rnn.py).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import numpy as np


# ------------------------------------------------------------- file loading
def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load safetensors / pytorch .bin / .pth into numpy (reference
    from_pretrained fallback order, cma_policy.py:85-110)."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin", "model.pth"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            # sharded safetensors
            shards = sorted(
                f for f in os.listdir(path) if f.endswith(".safetensors")
            )
            if shards:
                out: Dict[str, np.ndarray] = {}
                for s in shards:
                    out.update(load_torch_state_dict(os.path.join(path, s)))
                return out
            raise FileNotFoundError(f"no weights found in {path}")
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


# ------------------------------------------------------------------ helpers
def t_linear(sd, name, dest, params, bias=True):
    params[dest + "/kernel"] = np.ascontiguousarray(sd[name + ".weight"].T)
    if bias and name + ".bias" in sd:
        params[dest + "/bias"] = sd[name + ".bias"]


def t_conv(sd, name, dest, params, bias=False):
    w = sd[name + ".weight"]
    params[dest + "/kernel"] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    if bias and name + ".bias" in sd:
        params[dest + "/bias"] = sd[name + ".bias"]


def t_norm(sd, name, dest, params, scale_name="scale", bias_name="bias"):
    if name + ".weight" in sd:
        params[dest + f"/{scale_name}"] = sd[name + ".weight"]
    if name + ".bias" in sd:
        params[dest + f"/{bias_name}"] = sd[name + ".bias"]


def t_rmsnorm(sd, name, dest, params):
    params[dest + "/scale"] = sd[name + ".weight"]


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


# --------------------------------------------------------------- Qwen2.5-VL
def convert_qwen25vl_text(sd: Dict[str, np.ndarray], prefix: str = "model.language_model.") -> Dict:
    """HF Qwen2_5_VLTextModel state dict → QwenTextModel params.

    HF ≥4.52 layout: model.language_model.layers.N..., lm_head at top level.
    Older layout (model.layers.N...) also accepted via prefix.
    """
    if not any(k.startswith(prefix) for k in sd):
        prefix = "model."
    p: Dict[str, np.ndarray] = {}
    p["embed_tokens/embedding"] = sd[prefix + "embed_tokens.weight"]
    n_layers = 0
    while f"{prefix}layers.{n_layers}.self_attn.q_proj.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        src = f"{prefix}layers.{i}."
        dst = f"layers_{i}/"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t_linear(sd, src + "self_attn." + proj, dst + "self_attn/" + proj, p)
        for proj in ("gate_proj", "up_proj", "down_proj"):
            t_linear(sd, src + "mlp." + proj, dst + "mlp/" + proj, p)
        t_rmsnorm(sd, src + "input_layernorm", dst + "input_layernorm", p)
        t_rmsnorm(sd, src + "post_attention_layernorm", dst + "post_attention_layernorm", p)
    t_rmsnorm(sd, prefix + "norm", "norm", p)
    if "lm_head.weight" in sd:
        t_linear(sd, "lm_head", "lm_head", p, bias=False)
    return unflatten(p)


def convert_qwen25vl_vision(sd: Dict[str, np.ndarray], prefix: str = "model.visual.") -> Dict:
    """HF Qwen2_5_VisionTransformer state dict → QwenVisionTower params."""
    if not any(k.startswith(prefix) for k in sd):
        prefix = "visual."
    p: Dict[str, np.ndarray] = {}
    # patch_embed: HF conv3d (O, I, t, h, w) → our Dense over flattened patch
    w = sd[prefix + "patch_embed.proj.weight"]
    O = w.shape[0]
    p["patch_embed/kernel"] = np.ascontiguousarray(w.reshape(O, -1).T)
    n = 0
    while f"{prefix}blocks.{n}.attn.qkv.weight" in sd:
        n += 1
    for i in range(n):
        src = f"{prefix}blocks.{i}."
        dst = f"blocks_{i}/"
        t_linear(sd, src + "attn.qkv", dst + "qkv", p)
        t_linear(sd, src + "attn.proj", dst + "proj", p)
        t_rmsnorm(sd, src + "norm1", dst + "norm1", p)
        t_rmsnorm(sd, src + "norm2", dst + "norm2", p)
        t_linear(sd, src + "mlp.gate_proj", dst + "gate_proj", p)
        t_linear(sd, src + "mlp.up_proj", dst + "up_proj", p)
        t_linear(sd, src + "mlp.down_proj", dst + "down_proj", p)
    t_rmsnorm(sd, prefix + "merger.ln_q", "merger_ln_q", p)
    t_linear(sd, prefix + "merger.mlp.0", "merger_fc1", p)
    t_linear(sd, prefix + "merger.mlp.2", "merger_fc2", p)
    return unflatten(p)


def convert_qwen25vl(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {
        "language_model": convert_qwen25vl_text(sd),
        "visual": convert_qwen25vl_vision(sd),
    }


# --------------------------------------------------------- torchvision CNNs
_TV_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3),
              "resnet50": (3, 4, 6, 3)}


def convert_torchvision_resnet(sd: Dict[str, np.ndarray], version: str = "resnet50",
                               prefix: str = "") -> Dict:
    """torchvision ResNet state dict → TorchVisionResNet params (frozen BN:
    running stats land in mean/var)."""
    bottleneck = version == "resnet50"
    layers = _TV_LAYERS[version]
    p: Dict[str, np.ndarray] = {}

    def bn(src, dst):
        p[dst + "/scale"] = sd[src + ".weight"]
        p[dst + "/bias"] = sd[src + ".bias"]
        p[dst + "/mean"] = sd[src + ".running_mean"]
        p[dst + "/var"] = sd[src + ".running_var"]

    t_conv(sd, prefix + "conv1", "stem_conv", p)
    bn(prefix + "bn1", "stem_bn")
    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"{prefix}layer{stage + 1}.{b}."
            dst = f"layer{stage + 1}_{b}/"
            for ci in range(1, n_convs + 1):
                t_conv(sd, src + f"conv{ci}", dst + f"conv{ci}", p)
                bn(src + f"bn{ci}", dst + f"bn{ci}")
            if src + "downsample.0.weight" in sd:
                t_conv(sd, src + "downsample.0", dst + "ds_conv", p)
                bn(src + "downsample.1", dst + "ds_bn")
    return unflatten(p)


# --------------------------------------------------- habitat GN ResNet (depth)
def convert_habitat_resnet_encoder(sd: Dict[str, np.ndarray], prefix: str = "",
                                   layers=(3, 4, 6, 3), bottleneck=True) -> Dict:
    """DD-PPO visual_encoder state dict → HabitatResNetEncoder params.

    Torch layout (reference resnet.py): backbone.conv1.0 conv / .1 GN;
    blocks as backbone.layerL.B.convs.{0,1,3,4,6,7} conv/GN (+ downsample),
    compression.0 conv / compression.1 GN.
    """
    p: Dict[str, np.ndarray] = {}

    def gn(src, dst):
        p[dst + "/scale"] = sd[src + ".weight"]
        p[dst + "/bias"] = sd[src + ".bias"]

    t_conv(sd, prefix + "backbone.conv1.0", "backbone/stem_conv", p)
    gn(prefix + "backbone.conv1.1", "backbone/stem_gn")
    # torch Sequential inside block interleaves conv/gn/relu → indices
    torch_conv_idx = (0, 3, 6) if bottleneck else (0, 3)
    torch_gn_idx = (1, 4, 7) if bottleneck else (1, 4)
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"{prefix}backbone.layer{stage + 1}.{b}."
            dst = f"backbone/layer{stage + 1}_{b}/"
            for ci, (tc, tg) in enumerate(zip(torch_conv_idx, torch_gn_idx), start=1):
                t_conv(sd, src + f"convs.{tc}", dst + f"conv{ci}", p)
                gn(src + f"convs.{tg}", dst + f"gn{ci}")
            if src + "downsample.0.weight" in sd:
                t_conv(sd, src + "downsample.0", dst + "ds_conv", p)
                gn(src + "downsample.1", dst + "ds_gn")
    t_conv(sd, prefix + "compression.0", "compress_conv", p)
    gn(prefix + "compression.1", "compress_gn")
    return unflatten(p)


# -------------------------------------------------------------- DINOv2 ViT-S
def convert_dinov2_vits(sd: Dict[str, np.ndarray], prefix: str = "pretrained.") -> Dict:
    """DepthAnythingV2 `.pretrained` DINOv2 trunk → DinoViT params."""
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    p: Dict[str, np.ndarray] = {}
    p["cls_token"] = sd[prefix + "cls_token"]
    p["pos_embed"] = sd[prefix + "pos_embed"]
    t_conv(sd, prefix + "patch_embed.proj", "patch_embed", p, bias=True)
    n = 0
    while f"{prefix}blocks.{n}.attn.qkv.weight" in sd:
        n += 1
    for i in range(n):
        src = f"{prefix}blocks.{i}."
        dst = f"block_{i}/"
        qkv_w = sd[src + "attn.qkv.weight"]  # (3D, D)
        qkv_b = sd[src + "attn.qkv.bias"]
        D = qkv_w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            p[dst + f"attn/{name}/kernel"] = np.ascontiguousarray(
                qkv_w[j * D : (j + 1) * D].T)
            p[dst + f"attn/{name}/bias"] = qkv_b[j * D : (j + 1) * D]
        t_linear(sd, src + "attn.proj", dst + "attn/out_proj", p)
        p[dst + "norm1/scale"] = sd[src + "norm1.weight"]
        p[dst + "norm1/bias"] = sd[src + "norm1.bias"]
        p[dst + "norm2/scale"] = sd[src + "norm2.weight"]
        p[dst + "norm2/bias"] = sd[src + "norm2.bias"]
        t_linear(sd, src + "mlp.fc1", dst + "mlp_fc1", p)
        t_linear(sd, src + "mlp.fc2", dst + "mlp_fc2", p)
        p[dst + "ls1"] = sd[src + "ls1.gamma"]
        p[dst + "ls2"] = sd[src + "ls2.gamma"]
    if prefix + "norm.weight" in sd:
        p["norm/scale"] = sd[prefix + "norm.weight"]
        p["norm/bias"] = sd[prefix + "norm.bias"]
    return unflatten(p)


def interpolate_dino_pos_embed(pos: np.ndarray, grid_hw,
                               offset: float = 0.1) -> np.ndarray:
    """Resize DINOv2 position embeddings (1, 1+N, D) to a target patch grid
    exactly as the reference does at runtime (dinov2.py:180-211: bicubic in
    scale-factor form with the +0.1 offset, antialias=False). Our DinoViT
    holds a fixed-size pos table, so the resize happens once at conversion
    time — torch is available there by construction."""
    import math

    import torch
    import torch.nn.functional as F

    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    n = patch_pos.shape[1]
    s = int(math.sqrt(n))
    h, w = grid_hw
    if (h, w) == (s, s):
        return pos
    dim = pos.shape[-1]
    t = torch.from_numpy(np.ascontiguousarray(patch_pos, np.float32))
    t = t.reshape(1, s, s, dim).permute(0, 3, 1, 2)
    t = F.interpolate(t, scale_factor=((h + offset) / s, (w + offset) / s),
                      mode="bicubic", antialias=False)
    assert t.shape[-2:] == (h, w)
    out = t.permute(0, 2, 3, 1).reshape(1, h * w, dim).numpy()
    return np.concatenate([cls_pos.astype(np.float32), out], axis=1)


def convert_depth_anything_v2(sd: Dict[str, np.ndarray],
                              grid_hw=None) -> Dict:
    """Full DepthAnythingV2 checkpoint (pretrained.* DINOv2 trunk +
    depth_head.* DPT head, dpt.py:38-185) → encoder.dpt.DepthAnythingV2
    params. ConvTranspose kernels map (I, O, kH, kW) → (kH, kW, O, I) for
    flax transpose_kernel=True semantics."""
    h = "depth_head."
    flat: Dict[str, np.ndarray] = {}
    for i in range(4):
        t_conv(sd, f"{h}projects.{i}", f"project_{i}", flat, bias=True)
    for i in (0, 1):
        w = sd[f"{h}resize_layers.{i}.weight"]  # torch CT2d: (I, O, kH, kW)
        flat[f"resize_{i}/kernel"] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0))
        flat[f"resize_{i}/bias"] = sd[f"{h}resize_layers.{i}.bias"]
    t_conv(sd, f"{h}resize_layers.3", "resize_3", flat, bias=True)
    for i in range(1, 5):
        t_conv(sd, f"{h}scratch.layer{i}_rn", f"layer{i}_rn", flat, bias=False)
    for i in range(1, 5):
        rp = f"{h}scratch.refinenet{i}."
        dp = f"refinenet{i}/"
        t_conv(sd, rp + "out_conv", dp + "out_conv", flat, bias=True)
        for j, nm in ((1, "res1"), (2, "res2")):
            t_conv(sd, rp + f"resConfUnit{j}.conv1", dp + f"{nm}/conv1",
                   flat, bias=True)
            t_conv(sd, rp + f"resConfUnit{j}.conv2", dp + f"{nm}/conv2",
                   flat, bias=True)
    t_conv(sd, f"{h}scratch.output_conv1", "output_conv1", flat, bias=True)
    t_conv(sd, f"{h}scratch.output_conv2.0", "output_conv2_0", flat, bias=True)
    t_conv(sd, f"{h}scratch.output_conv2.2", "output_conv2_2", flat, bias=True)
    trunk = convert_dinov2_vits(sd, "pretrained.")
    if grid_hw is not None:
        trunk["pos_embed"] = interpolate_dino_pos_embed(
            np.asarray(trunk["pos_embed"]), grid_hw)
    return {"pretrained": trunk, "depth_head": unflatten(flat)}


# ------------------------------------------------------------------ generic
def convert_gru(sd: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """torch GRU/LSTM layer-0 weights → ops.rnn param dict (same gate order)."""
    return {
        "w_ih": sd[name + ".weight_ih_l0"],
        "w_hh": sd[name + ".weight_hh_l0"],
        "b_ih": sd[name + ".bias_ih_l0"],
        "b_hh": sd[name + ".bias_hh_l0"],
    }


def convert_lstm_bidir(sd: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    """torch bidirectional LSTM/GRU layer-0 → ops.rnn params (fwd + rev)."""
    out = convert_gru(sd, name)
    if name + ".weight_ih_l0_reverse" in sd:
        out.update({
            "rev_w_ih": sd[name + ".weight_ih_l0_reverse"],
            "rev_w_hh": sd[name + ".weight_hh_l0_reverse"],
            "rev_b_ih": sd[name + ".bias_ih_l0_reverse"],
            "rev_b_hh": sd[name + ".bias_hh_l0_reverse"],
        })
    return out


def t_conv1d(sd, name, dest, params):
    """torch Conv1d kernel_size=1 (O, I, 1) → Dense kernel (I, O)."""
    params[dest + "/kernel"] = np.ascontiguousarray(sd[name + ".weight"][:, :, 0].T)
    if name + ".bias" in sd:
        params[dest + "/bias"] = sd[name + ".bias"]


def strip_prefixes(sd: Dict[str, np.ndarray],
                   prefixes=("module.", "net.")) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def _tv_cnn_keys(sd: Dict[str, np.ndarray], enc_prefix: str) -> Dict[str, np.ndarray]:
    """Rewrite the reference TorchVisionResNet `cnn.` Sequential indices to
    torchvision attribute names (resnet_encoders.py:144: cnn.0=conv1,
    cnn.1=bn1, cnn.4..7=layer1..4)."""
    remap = {"cnn.0.": "conv1.", "cnn.1.": "bn1.", "cnn.4.": "layer1.",
             "cnn.5.": "layer2.", "cnn.6.": "layer3.", "cnn.7.": "layer4."}
    out = {}
    for k, v in sd.items():
        if not k.startswith(enc_prefix):
            continue
        rest = k[len(enc_prefix):]
        for old, new in remap.items():
            if rest.startswith(old):
                rest = new + rest[len(old):]
                break
        out[rest] = v
    return out


def _reorder_flatten_linear(kernel: np.ndarray, channels: int,
                            tokens: int) -> np.ndarray:
    """Torch flattens (B, C, T) channel-major before a Linear; our encoders
    emit (B, T, C) token-major. Permute the converted kernel's input rows so
    ours[t*C + c] = torch[c*T + t]."""
    out = kernel.shape[1]
    return np.ascontiguousarray(
        kernel.reshape(channels, tokens, out).transpose(1, 0, 2)
        .reshape(channels * tokens, out))


def _spatial_embed(w: np.ndarray) -> np.ndarray:
    """The reference appends spatial embeddings via `view(1, -1, h, w)`
    (resnet_encoders.py:199-216) — a raw reshape of the (h*w, dim) table to
    (dim, h, w), NOT a transpose. Our flax encoders index the table as
    [token, dim], so convert: ours[t, d] = w.flat[d * (h*w) + t]."""
    n, d = w.shape
    return np.ascontiguousarray(w.reshape(d, n).T)


# ------------------------------------------------------------- full policies
def convert_cma_policy(sd: Dict[str, np.ndarray],
                       rgb_version: str = "resnet50") -> Dict[str, Any]:
    """Reference CMANet state dict (cma_policy.py:131-242 module names) →
    complete CMANet (flax) param tree."""
    sd = strip_prefixes(sd)
    p: Dict[str, np.ndarray] = {}
    # text/visual encoders
    instr = convert_lstm_bidir(sd, "instruction_encoder.encoder_rnn")
    instr["embedding"] = sd["instruction_encoder.embedding_layer.weight"]
    depth = convert_habitat_resnet_encoder(sd, prefix="depth_encoder.visual_encoder.")
    rgb = convert_torchvision_resnet(_tv_cnn_keys(sd, "rgb_encoder."), rgb_version)
    rgb["spatial_embeddings"] = _spatial_embed(sd["rgb_encoder.spatial_embeddings.weight"])
    # heads / fusion
    t_linear(sd, "rgb_linear.2", "rgb_linear", p)
    t_linear(sd, "depth_linear.1", "depth_linear", p)
    # depth_linear consumes torch's channel-major flatten of (B, C, 16)
    dl = p["depth_linear/kernel"]
    p["depth_linear/kernel"] = _reorder_flatten_linear(dl, dl.shape[0] // 16, 16)
    t_conv1d(sd, "rgb_kv", "rgb_kv", p)
    t_conv1d(sd, "depth_kv", "depth_kv", p)
    t_conv1d(sd, "text_k", "text_k", p)
    t_linear(sd, "state_q", "state_q", p)
    t_linear(sd, "text_q", "text_q", p)
    t_linear(sd, "second_state_compress.0", "second_state_compress", p)
    t_linear(sd, "progress_monitor", "progress_monitor", p)
    t_linear(sd, "action_distribution.linear", "action_head", p)
    tree = unflatten(p)
    tree.update({
        "instruction_encoder": instr,
        "rgb_encoder": rgb,
        "depth_encoder": {
            "visual_encoder": depth,
            "spatial_embeddings": _spatial_embed(
                sd["depth_encoder.spatial_embeddings.weight"]),
        },
        "prev_action_embed": {"embedding": sd["prev_action_embedding.weight"]},
        "state_encoder": convert_gru(sd, "state_encoder.rnn"),
        "second_state_encoder": convert_gru(sd, "second_state_encoder.rnn"),
    })
    return tree


def convert_seq2seq_policy(sd: Dict[str, np.ndarray],
                           rgb_version: str = "resnet50") -> Dict[str, Any]:
    """Reference Seq2SeqNet state dict (seq2seq_policy.py:128-179) →
    complete Seq2SeqNet (flax) param tree."""
    sd = strip_prefixes(sd)
    p: Dict[str, np.ndarray] = {}
    instr = convert_lstm_bidir(sd, "instruction_encoder.encoder_rnn")
    instr["embedding"] = sd["instruction_encoder.embedding_layer.weight"]
    depth = convert_habitat_resnet_encoder(sd, prefix="depth_encoder.visual_encoder.")
    rgb = convert_torchvision_resnet(_tv_cnn_keys(sd, "rgb_encoder."), rgb_version)
    t_linear(sd, "rgb_encoder.fc.1", "rgb_encoder/fc", p)
    t_linear(sd, "depth_encoder.visual_fc.1", "depth_encoder/visual_fc", p)
    # visual_fc consumes torch's channel-major flatten of (B, C, 4, 4)
    vf = p["depth_encoder/visual_fc/kernel"]
    p["depth_encoder/visual_fc/kernel"] = _reorder_flatten_linear(
        vf, vf.shape[0] // 16, 16)
    t_linear(sd, "progress_monitor", "progress_monitor", p)
    t_linear(sd, "action_distribution.linear", "action_head", p)
    tree = unflatten(p)
    rgb.update(tree.pop("rgb_encoder", {}))
    depth_extra = tree.pop("depth_encoder", {})
    tree.update({
        "instruction_encoder": instr,
        "rgb_encoder": rgb,
        "depth_encoder": {"visual_encoder": depth, **depth_extra},
        "state_encoder": convert_gru(sd, "state_encoder.rnn"),
    })
    if "prev_action_embedding.weight" in sd:
        tree["prev_action_embed"] = {"embedding": sd["prev_action_embedding.weight"]}
    return tree


# --------------------------------------------------------- bert / crossmodal
def convert_bert_language_encoder(sd: Dict[str, np.ndarray],
                                  prefix: str = "") -> Dict[str, Any]:
    """Reference vendored LanguageEncoder (instruction_roberta_encoder.py:6 +
    bert_backbone.py RobertaEmbeddings/RobertaLayer) → our bert.LanguageEncoder.

    token_type embedding (all type ids 0) is folded into the position table.
    """
    p: Dict[str, np.ndarray] = {}
    emb = prefix + "embeddings."
    pos = sd[emb + "position_embeddings.weight"].copy()
    if emb + "token_type_embeddings.weight" in sd:
        pos = pos + sd[emb + "token_type_embeddings.weight"][0][None]
    p["embeddings/word_embeddings/embedding"] = sd[emb + "word_embeddings.weight"]
    p["embeddings/position_embeddings/embedding"] = pos
    t_norm(sd, emb + "LayerNorm", "embeddings/LayerNorm", p)
    i = 0
    while f"{prefix}layer.{i}.attention.self.query.weight" in sd:
        src = f"{prefix}layer.{i}."
        dst = f"layer_{i}/"
        t_linear(sd, src + "attention.self.query", dst + "attention/q_proj", p)
        t_linear(sd, src + "attention.self.key", dst + "attention/k_proj", p)
        t_linear(sd, src + "attention.self.value", dst + "attention/v_proj", p)
        t_linear(sd, src + "attention.output.dense", dst + "attention/out_proj", p)
        t_norm(sd, src + "attention.output.LayerNorm", dst + "attn_ln", p)
        t_linear(sd, src + "intermediate.dense", dst + "intermediate", p)
        t_linear(sd, src + "output.dense", dst + "output", p)
        t_norm(sd, src + "output.LayerNorm", dst + "out_ln", p)
        i += 1
    return unflatten(p)


def convert_crossmodal_encoder(sd: Dict[str, np.ndarray],
                               prefix: str = "") -> Dict[str, Any]:
    """Reference VisionLanguageEncoder / CrossmodalEncoder (bert_backbone.py
    :706-830: BertCrossLayer = self BertAttention + cross BertAttention +
    intermediate + output) → our bert.VisionLanguageEncoder."""
    p: Dict[str, np.ndarray] = {}
    base = prefix + "cross_modal_encoder.crossattention."
    if base + "0.attention.self.query.weight" not in sd:
        base = prefix + "crossattention."
    i = 0
    while f"{base}{i}.attention.self.query.weight" in sd:
        src = f"{base}{i}."
        dst = f"layer_{i}/"
        t_linear(sd, src + "attention.self.query", dst + "self_attn/q_proj", p)
        t_linear(sd, src + "attention.self.key", dst + "self_attn/k_proj", p)
        t_linear(sd, src + "attention.self.value", dst + "self_attn/v_proj", p)
        t_linear(sd, src + "attention.output.dense", dst + "self_attn/out_proj", p)
        t_norm(sd, src + "attention.output.LayerNorm", dst + "self_ln", p)
        t_linear(sd, src + "crossattention.self.query", dst + "cross_attn/q_proj", p)
        t_linear(sd, src + "crossattention.self.key", dst + "cross_attn/k_proj", p)
        t_linear(sd, src + "crossattention.self.value", dst + "cross_attn/v_proj", p)
        t_linear(sd, src + "crossattention.output.dense", dst + "cross_attn/out_proj", p)
        t_norm(sd, src + "crossattention.output.LayerNorm", dst + "cross_ln", p)
        t_linear(sd, src + "intermediate.dense", dst + "intermediate", p)
        t_linear(sd, src + "output.dense", dst + "output", p)
        t_norm(sd, src + "output.LayerNorm", dst + "out_ln", p)
        i += 1
    return unflatten(p)


# -------------------------------------------------------------- CLIP visual
def convert_clip_visual(sd: Dict[str, np.ndarray],
                        prefix: str = "visual.") -> Dict[str, Any]:
    """OpenAI/Long-CLIP visual tower state dict → CLIPVisionTower params."""
    p: Dict[str, np.ndarray] = {}
    p["class_embedding"] = sd[prefix + "class_embedding"]
    p["positional_embedding"] = sd[prefix + "positional_embedding"]
    t_conv(sd, prefix + "conv1", "conv1", p)
    t_norm(sd, prefix + "ln_pre", "ln_pre", p)
    i = 0
    while f"{prefix}transformer.resblocks.{i}.ln_1.weight" in sd:
        src = f"{prefix}transformer.resblocks.{i}."
        dst = f"block_{i}/"
        t_norm(sd, src + "ln_1", dst + "ln_1", p)
        t_norm(sd, src + "ln_2", dst + "ln_2", p)
        w = sd[src + "attn.in_proj_weight"]
        b = sd[src + "attn.in_proj_bias"]
        D = w.shape[1]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            p[dst + f"attn/{name}/kernel"] = np.ascontiguousarray(
                w[j * D:(j + 1) * D].T)
            p[dst + f"attn/{name}/bias"] = b[j * D:(j + 1) * D]
        t_linear(sd, src + "attn.out_proj", dst + "attn/out_proj", p)
        t_linear(sd, src + "mlp.c_fc", dst + "c_fc", p)
        t_linear(sd, src + "mlp.c_proj", dst + "c_proj", p)
        i += 1
    return unflatten(p)


def convert_distance_network(sd: Dict[str, np.ndarray],
                             prefix: str) -> Dict[str, Any]:
    """Reference DistanceNetwork Sequential (distance_encoder.py:9-15:
    Linear@0, ReLU, Linear@2, ReLU, Linear@4) → fc1/fc2/fc3."""
    p: Dict[str, np.ndarray] = {}
    t_linear(sd, prefix + "network.0", "fc1", p)
    t_linear(sd, prefix + "network.2", "fc2", p)
    t_linear(sd, prefix + "network.4", "fc3", p)
    return unflatten(p)


def _torch_mha(sd, name, dst, p):
    """torch nn.MultiheadAttention (in_proj packed) → our MultiHeadAttention."""
    w = sd[name + ".in_proj_weight"]
    b = sd[name + ".in_proj_bias"]
    D = w.shape[1]
    for j, nm in enumerate(("q_proj", "k_proj", "v_proj")):
        p[dst + f"/{nm}/kernel"] = np.ascontiguousarray(w[j * D:(j + 1) * D].T)
        p[dst + f"/{nm}/bias"] = b[j * D:(j + 1) * D]
    t_linear(sd, name + ".out_proj", dst + "/out_proj", p)


def convert_diffusion_transformer(sd: Dict[str, np.ndarray],
                                  prefix: str = "") -> Dict[str, Any]:
    """Reference TransformerForDiffusion (diffusion_policy_modified/
    transformer_for_diffusion_modified.py:49-145) → our
    encoder.diffusion_transformer.TransformerForDiffusion.

    Covers the obs-as-cond decoder configuration the RDP uses: input_emb,
    pos_emb, cond_obs_emb, cond_pos_emb, encoder (TransformerEncoder layers
    or the 2-linear Mish MLP), torch TransformerDecoder layers, ln_f, head.
    """
    p: Dict[str, np.ndarray] = {}
    t_linear(sd, prefix + "input_emb", "input_emb", p)
    p["pos_emb"] = sd[prefix + "pos_emb"]
    t_linear(sd, prefix + "cond_obs_emb", "cond_obs_emb", p)
    if prefix + "cond_pos_emb" in sd:
        p["cond_pos_emb"] = sd[prefix + "cond_pos_emb"]
    # cond encoder: Sequential MLP (encoder.0/.2) or TransformerEncoder
    if prefix + "encoder.0.weight" in sd:
        t_linear(sd, prefix + "encoder.0", "cond_mlp_1", p)
        t_linear(sd, prefix + "encoder.2", "cond_mlp_2", p)
    i = 0
    while f"{prefix}encoder.layers.{i}.self_attn.in_proj_weight" in sd:
        src = f"{prefix}encoder.layers.{i}."
        dst = f"cond_layer_{i}"
        _torch_mha(sd, src + "self_attn", dst + "/self_attn", p)
        t_linear(sd, src + "linear1", dst + "/linear1", p)
        t_linear(sd, src + "linear2", dst + "/linear2", p)
        t_norm(sd, src + "norm1", dst + "/norm1", p)
        t_norm(sd, src + "norm2", dst + "/norm2", p)
        i += 1
    i = 0
    while f"{prefix}decoder.layers.{i}.self_attn.in_proj_weight" in sd:
        src = f"{prefix}decoder.layers.{i}."
        dst = f"dec_layer_{i}"
        _torch_mha(sd, src + "self_attn", dst + "/self_attn", p)
        _torch_mha(sd, src + "multihead_attn", dst + "/cross_attn", p)
        t_linear(sd, src + "linear1", dst + "/linear1", p)
        t_linear(sd, src + "linear2", dst + "/linear2", p)
        t_norm(sd, src + "norm1", dst + "/norm1", p)
        t_norm(sd, src + "norm2", dst + "/norm2", p)
        t_norm(sd, src + "norm3", dst + "/norm3", p)
        i += 1
    t_norm(sd, prefix + "ln_f", "ln_f", p)
    t_linear(sd, prefix + "head", "head", p)
    return unflatten(p)


# ---------------------------------------------------------------- RDP policy
def convert_rdp_policy(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference RDPNet state dict (rdp_policy.py:116-297 module names) →
    our RDPNet param tree.

    Text path: roberta-style LanguageEncoder or Long-CLIP
    (instruction_encoder.text_transformer.*). Image path: Long-CLIP /
    CLIP visual tower + image_fc + DD-PPO depth tower + depth_linear.
    """
    sd = strip_prefixes(sd)
    tree: Dict[str, Any] = {}
    # text encoder
    if "instruction_encoder.embeddings.word_embeddings.weight" in sd:
        tree["instruction_encoder"] = convert_bert_language_encoder(
            sd, "instruction_encoder.")
    elif "instruction_encoder.text_transformer.token_embedding.weight" in sd:
        from internnav_tpu.model.encoder.longclip import convert_longclip_text

        tree["instruction_encoder"] = convert_longclip_text(
            sd, "instruction_encoder.text_transformer.")
    # image encoder (CLIP visual + fc + depth)
    img: Dict[str, Any] = {}
    for vis_prefix in ("image_encoder.image_transformer.visual.",
                       "image_encoder.image_transformer.vision_model."):
        if vis_prefix + "conv1.weight" in sd:
            img["visual"] = convert_clip_visual(sd, vis_prefix)
            break
    p: Dict[str, np.ndarray] = {}
    if "image_encoder.img_learnable_linear.weight" in sd:
        t_linear(sd, "image_encoder.img_learnable_linear", "img_learnable_linear", p)
    if "image_encoder.depth_learnable_linear.weight" in sd:
        t_linear(sd, "image_encoder.depth_learnable_linear", "depth_learnable_linear", p)
    if "image_encoder.depth_linear.1.weight" in sd:
        t_linear(sd, "image_encoder.depth_linear.1", "depth_linear", p)
        # torch flattens the (B, C, S, S) depth tokens channel-major
        dl = p["depth_linear/kernel"]
        p["depth_linear/kernel"] = _reorder_flatten_linear(dl, dl.shape[0] // 16, 16)
    img.update(unflatten(p))
    if "image_encoder.depth_encoder.visual_encoder.backbone.conv1.0.weight" in sd:
        img["depth_encoder"] = {
            "visual_encoder": convert_habitat_resnet_encoder(
                sd, "image_encoder.depth_encoder.visual_encoder."),
            "spatial_embeddings": _spatial_embed(
                sd["image_encoder.depth_encoder.spatial_embeddings.weight"]),
        }
    if img:
        tree["image_encoder"] = img
    # cross encoders
    tree["img_txt_cross_encoder"] = convert_crossmodal_encoder(
        sd, "img_txt_cross_encoder.")
    if "txt_img_cross_encoder.cross_modal_encoder.crossattention.0.attention.self.query.weight" in sd:
        tree["txt_img_cross_encoder"] = convert_crossmodal_encoder(
            sd, "txt_img_cross_encoder.")
    # recurrent state + small linears
    tree["state_encoder"] = convert_gru(sd, "state_encoder.rnn")
    p = {}
    t_linear(sd, "prev_action_embedding", "prev_action_embedding", p)
    t_linear(sd, "prev_action_embedding_dp", "prev_action_embedding_dp", p)
    if "imu_linear.weight" in sd:
        t_linear(sd, "imu_linear", "imu_linear", p)
        t_linear(sd, "imu_linear_dp", "imu_linear_dp", p)
    tree.update(unflatten(p))
    # aux heads + diffusion net
    tree["progress_monitor"] = convert_distance_network(sd, "progress_monitor.")
    if "stop_progress_predictor.network.0.weight" in sd:
        tree["stop_progress_predictor"] = convert_distance_network(
            sd, "stop_progress_predictor.")
    if "distance_pred_net.network.0.weight" in sd:
        tree["distance_pred_net"] = convert_distance_network(
            sd, "distance_pred_net.")
    tree["action_dp_pred_net"] = convert_diffusion_transformer(
        sd, "action_dp_pred_net.")
    if "action_type_embeds.weight" in sd:
        tree["action_type_embeds"] = {"embedding": sd["action_type_embeds.weight"]}
    return tree


# -------------------------------------------------------------- NavDP policy
def _convert_post_norm_decoder(sd: Dict[str, np.ndarray], prefix: str,
                               ) -> Dict[str, Any]:
    """torch TransformerDecoder (norm_first=False) → FormerDecoder post-norm
    naming (navdp_backbone.py layer_{i}_self/cross/ln1-3/ff1-2)."""
    p: Dict[str, np.ndarray] = {}
    i = 0
    while f"{prefix}layers.{i}.self_attn.in_proj_weight" in sd:
        src = f"{prefix}layers.{i}."
        _torch_mha(sd, src + "self_attn", f"layer_{i}_self", p)
        _torch_mha(sd, src + "multihead_attn", f"layer_{i}_cross", p)
        t_linear(sd, src + "linear1", f"layer_{i}_ff1", p)
        t_linear(sd, src + "linear2", f"layer_{i}_ff2", p)
        t_norm(sd, src + "norm1", f"layer_{i}_ln1", p)
        t_norm(sd, src + "norm2", f"layer_{i}_ln2", p)
        t_norm(sd, src + "norm3", f"layer_{i}_ln3", p)
        i += 1
    return unflatten(p)


def _convert_pre_norm_decoder(sd: Dict[str, np.ndarray], prefix: str,
                              ) -> Dict[str, Any]:
    """torch TransformerDecoder (norm_first=True) → FormerDecoder pre-norm
    naming (TransformerDecoderLayer under layer_{i})."""
    p: Dict[str, np.ndarray] = {}
    i = 0
    while f"{prefix}layers.{i}.self_attn.in_proj_weight" in sd:
        src = f"{prefix}layers.{i}."
        dst = f"layer_{i}"
        _torch_mha(sd, src + "self_attn", dst + "/self_attn", p)
        _torch_mha(sd, src + "multihead_attn", dst + "/cross_attn", p)
        t_linear(sd, src + "linear1", dst + "/linear1", p)
        t_linear(sd, src + "linear2", dst + "/linear2", p)
        t_norm(sd, src + "norm1", dst + "/norm1", p)
        t_norm(sd, src + "norm2", dst + "/norm2", p)
        t_norm(sd, src + "norm3", dst + "/norm3", p)
        i += 1
    return unflatten(p)


def convert_navdp_policy(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference NavDPNet state dict (navdp_policy.py:86-134 +
    navdp_backbone.py module names) → our NavDPNet param tree."""
    sd = strip_prefixes(sd)
    tree: Dict[str, Any] = {}

    rb: Dict[str, Any] = {
        "rgb_model": convert_dinov2_vits(sd, "rgbd_encoder.rgb_model."),
        "depth_model": convert_dinov2_vits(sd, "rgbd_encoder.depth_model."),
        "former_query": {"embedding": sd["rgbd_encoder.former_query.weight"]},
        "former_pe": {"embedding": sd["rgbd_encoder.former_pe.weight"]},
        "former_net": _convert_post_norm_decoder(sd, "rgbd_encoder.former_net."),
    }
    p: Dict[str, np.ndarray] = {}
    t_linear(sd, "rgbd_encoder.project_layer", "project_layer", p)
    rb.update(unflatten(p))
    tree["rgbd_encoder"] = rb

    for enc, torch_name in (("pixel_encoder", "pixelgoal_encoder"),
                            ("image_encoder", "imagegoal_encoder")):
        if f"{enc}.{torch_name}.cls_token" in sd:
            sub = {torch_name: convert_dinov2_vits(sd, f"{enc}.{torch_name}.")}
            p = {}
            t_linear(sd, f"{enc}.project_layer", "project_layer", p)
            sub.update(unflatten(p))
            tree[enc] = sub

    tree["decoder"] = _convert_pre_norm_decoder(sd, "decoder.")
    p = {}
    t_linear(sd, "point_encoder", "point_encoder", p)
    t_linear(sd, "input_embed", "input_embed", p)
    t_norm(sd, "layernorm", "final_ln", p)
    t_linear(sd, "action_head", "action_head", p)
    t_linear(sd, "critic_head", "critic_head", p)
    for head in ("pixel_aux_head", "image_aux_head"):
        if head + ".weight" in sd:
            t_linear(sd, head, head, p)
    tree.update(unflatten(p))
    tree["cond_pos_embed"] = {
        "embedding": sd["cond_pos_embed.position_embedding.weight"]}
    tree["out_pos_embed"] = {
        "embedding": sd["out_pos_embed.position_embedding.weight"]}
    return tree


# ---------------------------------------------------- InternVLA-N1 (flagship)
def convert_nextdit(sd: Dict[str, np.ndarray],
                    prefix: str = "model.traj_dit.model.") -> Dict[str, Any]:
    """Reference traj_dit (diffusers LuminaNextDiT2DModel vendored at
    nextdit_traj.py:181-368, wrapped by NextDiTCrossAttn) → our NextDiT.

    Layer map: caption_projection.linear_1/2 → caption_fc1/2;
    time_caption_embed.{timestep_embedder.linear_1/2, caption_embedder.0/1}
    → time_caption_embed.{time_fc1/2, cap_ln, cap_fc}; per block:
    norm1.{linear,norm} → norm1_linear/norm1_rms, attn1/attn2 to_q/k/v +
    norm_q/k, the shared mixed-output projection attn2.to_out.0 → to_out,
    feed_forward.linear_1/2/3, RMSNorms, gate; norm_out.linear_1/2 →
    norm_out_linear/norm_out_linear2. attn1.to_out is nn.Identity in the
    reference (nextdit_traj.py:87) — nothing to convert."""
    p: Dict[str, np.ndarray] = {}
    t_linear(sd, prefix + "caption_projection.linear_1", "caption_fc1", p)
    t_linear(sd, prefix + "caption_projection.linear_2", "caption_fc2", p)
    tce = prefix + "time_caption_embed."
    t_linear(sd, tce + "timestep_embedder.linear_1",
             "time_caption_embed/time_fc1", p)
    t_linear(sd, tce + "timestep_embedder.linear_2",
             "time_caption_embed/time_fc2", p)
    t_norm(sd, tce + "caption_embedder.0", "time_caption_embed/cap_ln", p)
    t_linear(sd, tce + "caption_embedder.1", "time_caption_embed/cap_fc", p)
    i = 0
    while f"{prefix}layers.{i}.gate" in sd:
        src = f"{prefix}layers.{i}."
        dst = f"layers_{i}"
        p[f"{dst}/gate"] = sd[src + "gate"]
        t_linear(sd, src + "norm1.linear", f"{dst}/norm1_linear", p)
        p[f"{dst}/norm1_rms/scale"] = sd[src + "norm1.norm.weight"]
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                t_linear(sd, src + f"{attn}.{proj}", f"{dst}/{attn}/{proj}",
                         p, bias=False)
            t_norm(sd, src + f"{attn}.norm_q", f"{dst}/{attn}/norm_q", p)
            t_norm(sd, src + f"{attn}.norm_k", f"{dst}/{attn}/norm_k", p)
        t_linear(sd, src + "attn2.to_out.0", f"{dst}/to_out", p, bias=False)
        p[f"{dst}/norm1_context/scale"] = sd[src + "norm1_context.weight"]
        p[f"{dst}/norm2/scale"] = sd[src + "norm2.weight"]
        p[f"{dst}/ffn_norm1/scale"] = sd[src + "ffn_norm1.weight"]
        p[f"{dst}/ffn_norm2/scale"] = sd[src + "ffn_norm2.weight"]
        for lin in ("linear_1", "linear_2", "linear_3"):
            t_linear(sd, src + f"feed_forward.{lin}",
                     f"{dst}/feed_forward/{lin}", p, bias=False)
        i += 1
    t_linear(sd, prefix + "norm_out.linear_1", "norm_out_linear", p)
    t_linear(sd, prefix + "norm_out.linear_2", "norm_out_linear2", p)
    return unflatten(p)


def convert_memory_encoder(sd: Dict[str, np.ndarray],
                           prefix: str = "model.memory_encoder.") -> Dict[str, Any]:
    """Reference MemoryEncoder (torch TransformerEncoder, post-norm,
    relu, ff 2048; internvla_n1_arch.py:76-95) → our MemoryEncoder."""
    p: Dict[str, np.ndarray] = {}
    p["memory_pos"] = sd[prefix + "memory_pos"]
    i = 0
    while f"{prefix}encoder.layers.{i}.self_attn.in_proj_weight" in sd:
        src = f"{prefix}encoder.layers.{i}."
        dst = f"layer_{i}"
        _torch_mha(sd, src + "self_attn", f"{dst}/self_attn", p)
        t_linear(sd, src + "linear1", f"{dst}/linear1", p)
        t_linear(sd, src + "linear2", f"{dst}/linear2", p)
        t_norm(sd, src + "norm1", f"{dst}/norm1", p)
        t_norm(sd, src + "norm2", f"{dst}/norm2", p)
        i += 1
    return unflatten(p)


def convert_qformer(sd: Dict[str, np.ndarray],
                    prefix: str = "model.rgb_resampler.") -> Dict[str, Any]:
    """Reference QFormer (torch TransformerDecoder, post-norm defaults;
    internvla_n1_arch.py:97-118) → our QFormer. The reference's
    `visual_proj` layer is defined but never called — skipped."""
    return {
        "query_tokens": sd[prefix + "query_tokens"],
        "query_pos": sd[prefix + "query_pos"],
        "decoder": _convert_post_norm_decoder(sd, prefix + "decoder."),
    }


def convert_internvla_n1(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full InternVLA-N1 checkpoint (InternVLAN1ForCausalLM state dict:
    Qwen2.5-VL trunk + System-1 modules, internvla_n1_arch.py:120-144) →
    the complete InternVLAN1Model flax param tree.

    Handles both HF key layouts (model.language_model./model.visual. for
    transformers >=4.52, model./visual. for ==4.51 as pinned by the
    reference requirements/internvla_n1.txt)."""
    text_prefix = ("model.language_model."
                   if any(k.startswith("model.language_model.") for k in sd)
                   else "model.")
    vis_prefix = ("model.visual."
                  if any(k.startswith("model.visual.") for k in sd)
                  else "visual.")
    params: Dict[str, Any] = {
        "language_model": convert_qwen25vl_text(sd, prefix=text_prefix),
        "visual": convert_qwen25vl_vision(sd, prefix=vis_prefix),
        "latent_queries": sd["model.latent_queries"],
    }
    if "model.traj_dit.model.caption_projection.linear_1.weight" in sd:
        p: Dict[str, np.ndarray] = {}
        t_linear(sd, "model.action_encoder", "action_encoder", p)
        t_linear(sd, "model.action_decoder", "action_decoder", p)
        t_linear(sd, "model.cond_projector.0", "cond_projector_0", p)
        t_linear(sd, "model.cond_projector.2", "cond_projector_1", p)
        params.update(unflatten(p))
        params["traj_dit"] = convert_nextdit(sd)
    if "model.rgb_model.cls_token" in sd:
        params["rgb_model"] = convert_dinov2_vits(sd, prefix="model.rgb_model.")
        params["memory_encoder"] = convert_memory_encoder(sd)
        params["rgb_resampler"] = convert_qformer(sd)
    return params
