"""DepthAnythingV2 DPT depth head (Flax, NHWC).

Parity target: the reference's vendored DepthAnythingV2
(internnav/model/encoder/depth_anything/depth_anything_v2/dpt.py:38-185 and
util/blocks.py): DPTHead over DINOv2 intermediate layers [2, 5, 8, 11]
(vits), refinenet fusion with align_corners=True bilinear upsampling, and a
sigmoid metric-depth output scaled by max_depth. The reference's consumers
only ever use the `.pretrained` trunk (navdp_backbone.py:125,
internvla_n1_arch.py:38) — this head completes the standalone
depth-estimation capability (SURVEY §2.2 "DepthAnythingV2", VERDICT r2
coverage table's one remaining model partial).

TPU notes: all convs run NHWC (fused by XLA onto the MXU); the
align_corners bilinear resizes are expressed as two small matmuls
(host-precomputed interpolation matrices), which XLA tiles onto the MXU —
`jax.image.resize` has no align_corners mode.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.encoder.vit import DinoViT, VITS_CONFIG

VITS_INTERMEDIATE_IDX = (2, 5, 8, 11)  # dpt.py:165
VITS_OUT_CHANNELS = (48, 96, 192, 384)  # navdp_backbone.py model_configs
VITS_FEATURES = 64


def _interp_matrix(s_in: int, s_out: int) -> np.ndarray:
    """(s_out, s_in) align_corners=True bilinear interpolation weights."""
    w = np.zeros((s_out, s_in), np.float32)
    if s_out == 1 or s_in == 1:
        w[:, 0] = 1.0
        return w
    pos = np.arange(s_out) * (s_in - 1) / (s_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, s_in - 1)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(s_out), lo] += 1.0 - frac
    w[np.arange(s_out), hi] += frac
    return w


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with torch align_corners=True semantics."""
    H, W = x.shape[1], x.shape[2]
    OH, OW = out_hw
    if (OH, OW) == (H, W):
        return x
    wh = jnp.asarray(_interp_matrix(H, OH), x.dtype)
    ww = jnp.asarray(_interp_matrix(W, OW), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bhwc->bhpc", ww, x)


class ResidualConvUnit(nn.Module):
    """util/blocks.py:29-80 (bn=False variant: relu→conv→relu→conv + skip)."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """util/blocks.py:83-146 (deconv=False, expand=False,
    align_corners=True)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None, size: Optional[Tuple[int, int]] = None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, name="res1")(skip)
        out = ResidualConvUnit(self.features, name="res2")(out)
        if size is None:
            size = (2 * out.shape[1], 2 * out.shape[2])  # scale_factor=2
        out = resize_bilinear_align_corners(out, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(out)


class DPTHead(nn.Module):
    """dpt.py:38-149 (use_bn=False, use_clstoken=False)."""

    in_channels: int = 384
    features: int = VITS_FEATURES
    out_channels: Sequence[int] = VITS_OUT_CHANNELS
    patch_size: int = 14

    @nn.compact
    def __call__(self, features, patch_h: int, patch_w: int):
        """features: list of 4 (patch_tokens (B, P, C), cls) tuples."""
        oc = list(self.out_channels)
        outs = []
        for i, feat in enumerate(features):
            tok = feat[0] if isinstance(feat, (tuple, list)) else feat
            B = tok.shape[0]
            x = tok.reshape(B, patch_h, patch_w, tok.shape[-1])
            x = nn.Conv(oc[i], (1, 1), name=f"project_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(oc[0], (4, 4), strides=(4, 4),
                                     padding="VALID", transpose_kernel=True,
                                     name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(oc[1], (2, 2), strides=(2, 2),
                                     padding="VALID", transpose_kernel=True,
                                     name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                            name="resize_3")(x)
            outs.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name=f"layer{i + 1}_rn")(outs[i]) for i in range(4)]

        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3])
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3])
        path1 = FeatureFusionBlock(self.features, name="refinenet1")(
            path2, rn[0])

        out = nn.Conv(self.features // 2, (3, 3), padding=1,
                      name="output_conv1")(path1)
        out = resize_bilinear_align_corners(
            out, (patch_h * self.patch_size, patch_w * self.patch_size))
        out = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), name="output_conv2_2")(out)
        return nn.sigmoid(out)


class DepthAnythingV2(nn.Module):
    """dpt.py:152-195 (vits metric-depth variant): DINOv2-S trunk +
    DPTHead; (B, H, W, 3) ImageNet-normalized pixels → (B, H, W) metric
    depth in [0, max_depth]."""

    features: int = VITS_FEATURES
    out_channels: Sequence[int] = VITS_OUT_CHANNELS
    max_depth: float = 20.0

    @nn.compact
    def __call__(self, pixels):
        p = VITS_CONFIG["patch_size"]
        patch_h, patch_w = pixels.shape[1] // p, pixels.shape[2] // p
        trunk = DinoViT(name="pretrained", **VITS_CONFIG)
        feats = trunk(pixels, intermediates=VITS_INTERMEDIATE_IDX)
        depth = DPTHead(VITS_CONFIG["dim"], self.features,
                        self.out_channels, p, name="depth_head")(
            feats, patch_h, patch_w)
        return depth[..., 0] * self.max_depth
