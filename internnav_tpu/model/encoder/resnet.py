"""ResNet visual encoders (Flax, NHWC, TPU-native layouts).

Two families, mirroring the reference's capability surface:

- `HabitatResNetEncoder`: GroupNorm ResNet (DD-PPO depth encoder) — the
  reference's habitat-style ResNet + compression head
  (internnav/model/encoder/resnet.py:190-478, resnet_encoders.py:16-120).
  Default config = resnet50: Bottleneck(expansion 4), layers (3,4,6,3),
  baseplanes 32, ngroups 16, 2048-flat compression output.
- `TorchVisionResNet`: BatchNorm ResNet18/50 (ImageNet RGB encoder,
  resnet_encoders.py:123-236) with 4x4 spatial-average output.

Both return token-major features (B, H*W, C) — the attention-friendly TPU
layout — rather than torch's NCHW; spatial position embeddings are appended
on the channel axis exactly like the reference's `spatial_embeddings`.

BatchNorm runs in inference mode (frozen running stats folded as affine
params): the reference trains both visual towers frozen
(`trainable: False` defaults, resnet_encoders.py:42/146).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * w + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def _conv(features, kernel, stride=1, groups=1, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        feature_group_count=groups,
        name=name,
    )


class GNBasicBlock(nn.Module):
    planes: int
    ngroups: int
    stride: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.ngroups, name="gn1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, name="conv2")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, name="gn2")(y)
        if self.use_downsample:
            residual = _conv(self.planes, 1, self.stride, name="ds_conv")(x)
            residual = nn.GroupNorm(num_groups=self.ngroups, name="ds_gn")(residual)
        return nn.relu(y + residual)


class GNBottleneck(nn.Module):
    planes: int
    ngroups: int
    stride: int = 1
    expansion: int = 4
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.planes * self.expansion
        y = _conv(self.planes, 1, name="conv1")(x)
        y = nn.GroupNorm(num_groups=self.ngroups, name="gn1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, self.stride, name="conv2")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, name="gn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, name="conv3")(y)
        y = nn.GroupNorm(num_groups=self.ngroups, name="gn3")(y)
        if self.use_downsample:
            residual = _conv(out_ch, 1, self.stride, name="ds_conv")(x)
            residual = nn.GroupNorm(num_groups=self.ngroups, name="ds_gn")(residual)
        return nn.relu(y + residual)


class GroupNormResNet(nn.Module):
    """Habitat-style GN ResNet trunk (reference resnet.py:190-290)."""

    base_planes: int = 32
    ngroups: int = 16
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # bottleneck | basic

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.base_planes, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, name="stem_conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.ngroups, name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 4 if self.block == "bottleneck" else 1
        Block = GNBottleneck if self.block == "bottleneck" else GNBasicBlock
        inplanes = self.base_planes
        planes = self.base_planes
        for stage, nblocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(nblocks):
                s = stride if b == 0 else 1
                need_ds = s != 1 or inplanes != planes * expansion
                x = Block(
                    planes=planes, ngroups=self.ngroups, stride=s,
                    use_downsample=need_ds, name=f"layer{stage + 1}_{b}",
                )(x)
                inplanes = planes * expansion
            planes *= 2
        return x


class HabitatResNetEncoder(nn.Module):
    """GN ResNet trunk + 3x3 compression head (reference resnet.py:380-478).

    Input: (B, H, W, C) depth (or rgb/255). Output: (B, S*S, Cc) tokens with
    Cc = round(2048 / S^2), S = (H/2) / 32.
    """

    base_planes: int = 32
    ngroups: int = 16
    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"

    @nn.compact
    def __call__(self, x):
        # stem avg-pool halves resolution before the trunk (resnet.py:470)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = GroupNormResNet(
            base_planes=self.base_planes, ngroups=self.ngroups,
            layers=self.layers, block=self.block, name="backbone",
        )(x)
        s = x.shape[1]
        num_c = int(round(2048 / (s * s)))
        x = _conv(num_c, 3, name="compress_conv")(x)
        x = nn.GroupNorm(num_groups=1, name="compress_gn")(x)
        x = nn.relu(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


# --------------------------------------------------- torchvision BN resnets
class BNBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.planes, 3, self.stride, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        if self.use_downsample:
            residual = _conv(self.planes, 1, self.stride, name="ds_conv")(x)
            residual = FrozenBatchNorm(self.planes, name="ds_bn")(residual)
        return nn.relu(y + residual)


class BNBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.planes * self.expansion
        y = _conv(self.planes, 1, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(self.planes, 3, self.stride, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.use_downsample:
            residual = _conv(out_ch, 1, self.stride, name="ds_conv")(x)
            residual = FrozenBatchNorm(out_ch, name="ds_bn")(residual)
        return nn.relu(y + residual)


_TV_CONFIGS = {
    "resnet18": ("basic", (2, 2, 2, 2), 512),
    "resnet34": ("basic", (3, 4, 6, 3), 512),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 2048),
}


class TorchVisionResNet(nn.Module):
    """BN ResNet trunk with 4x4 spatial-avg output + spatial embeddings
    (reference resnet_encoders.py:123-225).

    Input rgb: (B, H, W, 3), raw pixel values 0-255. Output:
    (B, 16, final_channels + 64) tokens, or (B, output_size) when
    spatial_output=False.
    """

    version: str = "resnet50"
    output_size: int = 256
    normalize_visual_inputs: bool = False
    spatial_output: bool = True
    spatial_embed_dim: int = 64

    @nn.compact
    def __call__(self, rgb):
        block_kind, layers, final_c = _TV_CONFIGS[self.version]
        x = rgb.astype(jnp.float32) / 255.0
        if self.normalize_visual_inputs:
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = (x - mean) / std

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv")(x)
        x = FrozenBatchNorm(64, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        Block = BNBottleneck if block_kind == "bottleneck" else BNBasicBlock
        expansion = 4 if block_kind == "bottleneck" else 1
        inplanes, planes = 64, 64
        for stage, nblocks in enumerate(layers):
            stride = 1 if stage == 0 else 2
            for b in range(nblocks):
                s = stride if b == 0 else 1
                need_ds = s != 1 or inplanes != planes * expansion
                x = Block(planes=planes, stride=s, use_downsample=need_ds,
                          name=f"layer{stage + 1}_{b}")(x)
                inplanes = planes * expansion
            planes *= 2

        if not self.spatial_output:
            x = jnp.mean(x, axis=(1, 2))  # global avg pool
            x = nn.Dense(self.output_size, name="fc")(x)
            return nn.relu(x)

        # adaptive avg pool to 4x4 (resnet_encoders.py:159-162)
        x = _adaptive_avg_pool(x, 4)
        B = x.shape[0]
        tokens = x.reshape(B, 16, final_c)
        spatial = self.param(
            "spatial_embeddings", nn.initializers.normal(1.0),
            (16, self.spatial_embed_dim),
        )
        spatial = jnp.broadcast_to(spatial[None], (B, 16, self.spatial_embed_dim))
        return jnp.concatenate([tokens, spatial.astype(tokens.dtype)], axis=-1)


def _adaptive_avg_pool(x, out_size: int):
    """torch adaptive_avg_pool2d semantics for NHWC input."""
    B, H, W, C = x.shape
    if H == out_size and W == out_size:
        return x
    if H % out_size == 0 and W % out_size == 0:
        kh, kw = H // out_size, W // out_size
        return nn.avg_pool(x, (kh, kw), strides=(kh, kw))
    # general case: mean over torch's per-cell index ranges
    import numpy as np

    def pool_axis(arr, axis, size, out):
        starts = (np.arange(out) * size) // out
        ends = -(-((np.arange(out) + 1) * size) // out)
        pieces = [
            jnp.mean(jnp.take(arr, jnp.arange(s, e), axis=axis), axis=axis, keepdims=True)
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, 1, H, out_size)
    x = pool_axis(x, 2, W, out_size)
    return x


class VlnResnetDepthEncoder(nn.Module):
    """Depth tower = HabitatResNetEncoder + spatial embeddings
    (reference resnet_encoders.py:16-120, spatial_output=True path).

    Input depth: (B, H, W, 1) in [0, 1]. Output: (B, S*S, C + 64).
    With 256x256 input: (B, 16, 128 + 64).
    """

    output_size: int = 128
    spatial_output: bool = True
    spatial_embed_dim: int = 64

    @nn.compact
    def __call__(self, depth):
        x = HabitatResNetEncoder(name="visual_encoder")(depth)  # (B, S*S, C)
        if not self.spatial_output:
            B = x.shape[0]
            x = x.reshape(B, -1)
            return nn.relu(nn.Dense(self.output_size, name="visual_fc")(x))
        B, T, C = x.shape
        spatial = self.param(
            "spatial_embeddings", nn.initializers.normal(1.0),
            (T, self.spatial_embed_dim),
        )
        spatial = jnp.broadcast_to(spatial[None], (B, T, self.spatial_embed_dim))
        return jnp.concatenate([x, spatial.astype(x.dtype)], axis=-1)
