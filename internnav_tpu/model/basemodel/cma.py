"""CMA (Cross-Modal Attention) VLN policy — Flax, TPU-native.

Functional parity target: reference internnav/model/basemodel/cma/
cma_policy.py (CMANet:67, _attn:261-266, _forward:268-325). Architecture:

  instruction --bi-LSTM--> per-token features (zeros at pad)
  rgb   --TorchVisionResNet50(spatial)--> 16 tokens x (2048+64)
  depth --DDPPO GN-ResNet50(spatial)--> 16 tokens x (128+64)
  [rgb_pool, depth_pool, prev_action] --GRU#1--> state
  state -q-> text attention -> text_emb -q-> rgb/depth attention
  concat --compress--> GRU#2 --> features -> categorical logits + progress

TPU-first differences from the reference (same math):
- token-major (B, T, C) layouts instead of NCHW; the reference's 1x1
  Conv1d k/v projections become per-token Dense layers;
- packed-sequence GRUs replaced by done-masked lax.scan (both GRUs scan
  jointly over time in seq mode, attention runs batched per frame);
- the whole train-mode forward is one jit region; no .detach()/clone
  bookkeeping (functional states).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.encoder.instruction import InstructionEncoder
from internnav_tpu.model.encoder.resnet import TorchVisionResNet, VlnResnetDepthEncoder
from internnav_tpu.model.encoder.rnn_state import RNNStateEncoder


def scaled_masked_attention(q, k, v, mask=None, scale=None):
    """Reference CMA _attn (cma_policy.py:261-266): logits = q·k_i, optional
    -1e8 mask, softmax over tokens of (logits * scale), output = Σ attn·v.
    q: (B, C); k: (B, T, C); v: (B, T, Cv); mask: (B, T) True = masked out.
    """
    logits = jnp.einsum("bc,btc->bt", q, k)
    if mask is not None:
        logits = logits - mask.astype(logits.dtype) * 1e8
    attn = jax.nn.softmax(logits * scale, axis=1)
    return jnp.einsum("bt,btc->bc", attn, v)


class CMANet(nn.Module):
    """Observations → (features, rnn_states_out, progress).

    Call with single-step (N, ...) or sequence (T, N, ...) observations.
    rnn_states: (N, 2, H); masks: 0 at episode starts.
    """

    cfg: ModelCfg

    def setup(self):
        c = self.cfg
        tc = c.text_encoder
        self.instruction_encoder = InstructionEncoder(
            vocab_size=tc.vocab_size,
            embedding_size=tc.embedding_size,
            hidden_size=tc.rnn_hidden_size,
            rnn_type="LSTM",
            final_state_only=False,  # CMA always uses per-token outputs (cma_policy.py:137)
            bidirectional=tc.bidirectional,
        )
        self.rgb_encoder = TorchVisionResNet(
            version=c.image_encoder.rgb.model_name,
            normalize_visual_inputs=c.normalize_rgb,
            spatial_output=True,
        )
        self.depth_encoder = VlnResnetDepthEncoder(
            output_size=c.image_encoder.depth.output_size, spatial_output=True
        )
        H = c.state_encoder.hidden_size
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

        instr_tokens = flat(observations["instruction"])
        instr_emb = self.instruction_encoder(instr_tokens)  # (B, L, Ct)
        text_pad = jnp.all(instr_emb == 0.0, axis=-1)  # (B, L) True at pad

        rgb_tokens = self.rgb_encoder(flat(rgb))  # (B, 16, 2112)
        depth_tokens = self.depth_encoder(flat(observations["depth"]))  # (B, 16, 192)

        pa = flat(prev_actions).reshape(-1)
        m_flat = flat(masks).reshape(-1)
        pa_idx = ((pa.astype(jnp.float32) + 1.0) * m_flat.astype(jnp.float32)).astype(jnp.int32)
        prev_act = self.prev_action_embed(pa_idx)  # (B, 32)

        rgb_in = nn.relu(self.rgb_linear(jnp.mean(rgb_tokens, axis=1)))
        depth_in = nn.relu(self.depth_linear(depth_tokens.reshape(depth_tokens.shape[0], -1)))
        state_in = jnp.concatenate([rgb_in, depth_in, prev_act], axis=1)

        def unflat_t(x):
            return x.reshape((T, N) + x.shape[1:]) if seq_mode else x

        state, h1 = self.state_encoder(unflat_t(state_in), rnn_states[:, :1], masks)
        state_flat = flat(state) if seq_mode else state

        text_q1 = self.state_q(state_flat)
        text_k = self.text_k(instr_emb)
        text_emb = scaled_masked_attention(text_q1, text_k, instr_emb, text_pad, self._scale)

        rgb_kv = self.rgb_kv(rgb_tokens)
        rgb_k, rgb_v = rgb_kv[..., : self._H // 2], rgb_kv[..., self._H // 2 :]
        depth_kv = self.depth_kv(depth_tokens)
        depth_k, depth_v = depth_kv[..., : self._H // 2], depth_kv[..., self._H // 2 :]
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


class CMAPolicy(Policy):
    """Reference-compatible forward(batch) with mode train/inference
    (cma_policy.py:327-341)."""

    name = "CMA_Policy"
    TORCH_CONVERTER_NAME = "convert_cma_policy"

    @classmethod
    def build(cls, cfg: ModelCfg, rng: Optional[jax.Array] = None) -> "CMAPolicy":
        module = CMANet(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        obs = {
            "instruction": jnp.zeros((1, 8), jnp.int32),
            "rgb": jnp.zeros((1, 224, 224, 3), jnp.float32),
            "depth": jnp.zeros((1, 256, 256, 1), jnp.float32),
        }
        params = module.init(
            rng, obs, jnp.zeros((1, 2, cfg.state_encoder.hidden_size)),
            jnp.zeros((1,), jnp.int32), jnp.ones((1,)),
        )["params"]
        return cls(module, params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[ModelCfg] = None) -> "CMAPolicy":
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
        if mode == "train":
            return logits, states, progress
        if mode == "inference":
            return jnp.argmax(logits, axis=-1, keepdims=True), states, progress
        return logits, states, progress
