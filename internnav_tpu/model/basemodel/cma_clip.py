"""CMA-CLIP — CMA with transformer text + CLIP image encoders.

Parity target: reference internnav/model/basemodel/cma/cma_clip_policy.py
(CMA_CLIP_Net, 419 LoC): the CMA two-stage-GRU cross-attention structure
with the GloVe-LSTM replaced by a LongCLIP/RoBERTa text encoder whose
per-token features are projected 512→256 (txt_linear_512_to_256,
cma_policy.py:141-143), and the torchvision RGB tower replaced by the CLIP
visual tower's patch tokens. Text pad mask comes from the tokenizer's
valid mask instead of the all-zero-channel trick.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.basemodel.cma import scaled_masked_attention
from internnav_tpu.model.encoder.bert import LanguageEncoder
from internnav_tpu.model.encoder.clip_vit import CLIPVisionTower
from internnav_tpu.model.encoder.resnet import VlnResnetDepthEncoder
from internnav_tpu.model.encoder.rnn_state import RNNStateEncoder


class CMACLIPNet(nn.Module):
    cfg: ModelCfg

    def setup(self):
        c = self.cfg
        H = c.state_encoder.hidden_size
        if getattr(c.text_encoder, "model_name", "") == "clip-long":
            # reference cma_clip path (cma_policy.py:141-143): Long-CLIP
            # text transformer + txt_linear_512_to_256
            from internnav_tpu.model.encoder.longclip import LongCLIPTextEncoder

            self.instruction_encoder = LongCLIPTextEncoder(
                vocab_size=c.text_encoder.vocab_size,
                width=c.text_encoder.hidden_size,
                layers=c.text_encoder.num_l_layers,
                heads=getattr(c.text_encoder, "num_heads", 8),
                context_length=getattr(c.text_encoder, "max_length", 248),
            )
        else:
            self.instruction_encoder = LanguageEncoder(
                vocab_size=c.text_encoder.vocab_size,
                hidden_size=c.text_encoder.hidden_size,
                num_layers=c.text_encoder.num_l_layers,
                num_heads=8,
                intermediate_size=4 * c.text_encoder.hidden_size,
            )
        self.txt_proj = nn.Dense(256)  # txt_linear_512_to_256 equivalent
        self.rgb_tower = CLIPVisionTower(
            width=getattr(c, "vit_width", 768),
            layers=getattr(c, "vit_layers", 12),
            heads=getattr(c, "vit_heads", 12),
        )
        self.depth_encoder = VlnResnetDepthEncoder(
            output_size=c.image_encoder.depth.output_size, spatial_output=True
        )
        rgb_out = c.image_encoder.rgb.output_size
        depth_out = c.image_encoder.depth.output_size
        self.prev_action_embed = nn.Embed(c.num_actions + 1, 32)
        self.rgb_linear = nn.Dense(rgb_out)
        self.depth_linear = nn.Dense(depth_out)
        self.state_encoder = RNNStateEncoder(
            input_size=rgb_out + depth_out + 32, hidden_size=H,
            rnn_type=c.state_encoder.rnn_type,
        )
        self.rgb_kv = nn.Dense(H // 2 + rgb_out)
        self.depth_kv = nn.Dense(H // 2 + depth_out)
        self.state_q = nn.Dense(H // 2)
        self.text_k = nn.Dense(H // 2)
        self.text_q = nn.Dense(H // 2)
        self.second_state_compress = nn.Dense(H)
        self.second_state_encoder = RNNStateEncoder(
            input_size=H, hidden_size=H, rnn_type=c.state_encoder.rnn_type,
        )
        self.progress_monitor = nn.Dense(1)
        self.action_head = nn.Dense(c.num_actions)
        self._scale = (H // 2) ** -0.5
        self._H = H

    def __call__(self, observations, rnn_states, prev_actions, masks):
        rgb = observations["rgb"]
        seq_mode = rgb.ndim == 5
        if seq_mode:
            T, N = rgb.shape[:2]
            flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        else:
            T, N = 1, rgb.shape[0]
            flat = lambda x: x

        tokens = flat(observations["instruction"])
        txt, txt_valid, _ = self.instruction_encoder(tokens)
        instr_emb = self.txt_proj(txt)  # (B, L, 256)
        text_pad = ~txt_valid

        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        pixels = (flat(rgb).astype(jnp.float32) / 255.0 - mean) / std
        rgb_tokens = self.rgb_tower(pixels)  # (B, 1+P, W)
        depth_tokens = self.depth_encoder(flat(observations["depth"]))

        pa = flat(prev_actions).reshape(-1)
        m_flat = flat(masks).reshape(-1)
        pa_idx = ((pa.astype(jnp.float32) + 1.0) * m_flat.astype(jnp.float32)).astype(jnp.int32)
        prev_act = self.prev_action_embed(pa_idx)

        rgb_in = nn.relu(self.rgb_linear(rgb_tokens[:, 0]))  # CLS pooled
        depth_in = nn.relu(self.depth_linear(depth_tokens.reshape(depth_tokens.shape[0], -1)))
        state_in = jnp.concatenate([rgb_in, depth_in, prev_act], axis=1)

        unflat_t = (lambda x: x.reshape((T, N) + x.shape[1:])) if seq_mode else (lambda x: x)
        state, h1 = self.state_encoder(unflat_t(state_in), rnn_states[:, :1], masks)
        state_flat = flat(state) if seq_mode else state

        text_q1 = self.state_q(state_flat)
        text_k = self.text_k(instr_emb)
        text_emb = scaled_masked_attention(text_q1, text_k, instr_emb, text_pad, self._scale)

        rgb_kv = self.rgb_kv(rgb_tokens[:, 1:])
        rgb_k, rgb_v = rgb_kv[..., : self._H // 2], rgb_kv[..., self._H // 2:]
        depth_kv = self.depth_kv(depth_tokens)
        depth_k, depth_v = depth_kv[..., : self._H // 2], depth_kv[..., self._H // 2:]
        tq = self.text_q(text_emb)
        rgb_att = scaled_masked_attention(tq, rgb_k, rgb_v, None, self._scale)
        depth_att = scaled_masked_attention(tq, depth_k, depth_v, None, self._scale)

        x = jnp.concatenate([state_flat, text_emb, rgb_att, depth_att, prev_act], axis=1)
        x = nn.relu(self.second_state_compress(x))
        x2, h2 = self.second_state_encoder(unflat_t(x), rnn_states[:, 1:], masks)
        x2_flat = flat(x2) if seq_mode else x2

        progress = jnp.tanh(self.progress_monitor(x2_flat))
        logits = self.action_head(x2_flat)
        states_out = jnp.concatenate([h1, h2], axis=1)
        if seq_mode:
            logits = logits.reshape(T, N, -1)
            progress = progress.reshape(T, N, -1)
        return logits, states_out, progress


class CMACLIPPolicy(Policy):
    name = "CMA_CLIP_Policy"

    @classmethod
    def build(cls, cfg: ModelCfg, rng: Optional[jax.Array] = None) -> "CMACLIPPolicy":
        module = CMACLIPNet(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        obs = {
            "instruction": jnp.ones((1, 8), jnp.int32) * 2,
            "rgb": jnp.zeros((1, 224, 224, 3), jnp.float32),
            "depth": jnp.zeros((1, 256, 256, 1), jnp.float32),
        }
        params = module.init(
            rng, obs, jnp.zeros((1, 2, cfg.state_encoder.hidden_size)),
            jnp.zeros((1,), jnp.int32), jnp.ones((1,)),
        )["params"]
        return cls(module, params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[ModelCfg] = None) -> "CMACLIPPolicy":
        cfg = cls.load_config(path, default=cfg)
        pol = cls.build(cfg)
        pol.params = cls.load_params_file(path, pol.params)
        return pol

    def num_recurrent_layers(self) -> int:
        return 2

    def forward(self, batch: Dict[str, Any]):
        mode = batch.get("mode", "features")

        def apply_fn(params, obs, states, prev_actions, masks):
            return self.module.apply({"params": params}, obs, states, prev_actions, masks)

        fn = self.jit_apply("fwd", lambda: jax.jit(apply_fn))
        logits, states, progress = fn(
            self.params, batch["observations"], batch["rnn_states"],
            batch["prev_actions"], batch["masks"],
        )
        if mode == "inference":
            return jnp.argmax(logits, axis=-1, keepdims=True), states, progress
        return logits, states, progress
