"""DINOv2-style ViT trunk (Flax) — the DepthAnythingV2 `pretrained` tower.

Parity target: the reference's vendored DINOv2 ViT-S
(internnav/model/encoder/depth_anything/depth_anything_v2/dinov2.py and
dinov2_layers/): patch 14, dim 384, 12 blocks, 6 heads, LayerScale,
cls token, learned pos embeddings with bicubic interpolation. Only
`get_intermediate_layers` (final-block patch tokens) is consumed by
NavDP/InternVLA-N1 (SURVEY.md §2.2), so that is the primary API.

The patch-embed input channel count is configurable: goal encoders reuse
the trunk with 6-channel (image-goal) and 7-channel (pixel-goal) inputs
(navdp_backbone.py:331-337, 394-400).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from internnav_tpu.model.encoder.transformer import MultiHeadAttention

VITS_CONFIG = dict(dim=384, depth=12, heads=6, patch_size=14)


class DinoBlock(nn.Module):
    dim: int
    heads: int
    ls_init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1", nn.initializers.constant(self.ls_init), (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(self.ls_init), (self.dim,))
        xn = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h, _ = MultiHeadAttention(self.dim, self.heads, name="attn")(xn, xn, xn)
        x = x + ls1 * h
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * 4, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + ls2 * y


class DinoViT(nn.Module):
    """(B, H, W, C) → patch tokens (B, P, dim) from the final block."""

    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 14
    in_channels: int = 3
    final_norm: bool = True

    @nn.compact
    def __call__(self, pixels, return_cls: bool = False,
                 intermediates: Optional[Sequence[int]] = None):
        """intermediates: block indices — returns a list of
        (patch_tokens, cls_token) per index with the final norm applied to
        each, matching DINOv2 get_intermediate_layers(..., norm=True,
        return_class_token=True) (dinov2.py:272-283,298-316) as the DPT
        depth head consumes it (dpt.py:181)."""
        B, H, W, C = pixels.shape
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(pixels)
        P_h, P_w = x.shape[1], x.shape[2]
        x = x.reshape(B, P_h * P_w, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + P_h * P_w, self.dim))
        x = x + pos
        taken = []
        for i in range(self.depth):
            x = DinoBlock(self.dim, self.heads, name=f"block_{i}")(x)
            if intermediates is not None and i in intermediates:
                taken.append(x)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm") if (
            self.final_norm or intermediates is not None) else None
        if intermediates is not None:
            outs = [norm(t) for t in taken]
            return [(t[:, 1:], t[:, 0]) for t in outs]
        if self.final_norm:
            x = norm(x)
        if return_cls:
            return x[:, 1:], x[:, 0]
        return x[:, 1:]  # patch tokens only (get_intermediate_layers semantics)


def dino_vits(in_channels: int = 3, name: Optional[str] = None) -> DinoViT:
    return DinoViT(in_channels=in_channels, name=name, **{
        k: v for k, v in VITS_CONFIG.items() if k != "patch_size"
    }, patch_size=VITS_CONFIG["patch_size"])


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) float images in [0, 1] → ImageNet-normalized."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD
