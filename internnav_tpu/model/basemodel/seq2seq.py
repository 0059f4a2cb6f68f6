"""Seq2Seq baseline VLN policy — Flax, TPU-native.

Parity target: reference internnav/model/basemodel/seq2seq/seq2seq_policy.py
(Seq2SeqNet:64-236). Architecture: final-state bi-LSTM instruction encoding
+ non-spatial DDPPO depth (128) + non-spatial ResNet50 RGB (256)
[+ prev-action embedding] → single GRU (512) → categorical head
(+ tanh progress monitor aux head).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from internnav_tpu.configs.model import ModelCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.encoder.instruction import InstructionEncoder
from internnav_tpu.model.encoder.resnet import TorchVisionResNet, VlnResnetDepthEncoder
from internnav_tpu.model.encoder.rnn_state import RNNStateEncoder


class Seq2SeqNet(nn.Module):
    cfg: ModelCfg
    use_prev_action: bool = False

    def setup(self):
        c = self.cfg
        tc = c.text_encoder
        self.instruction_encoder = InstructionEncoder(
            vocab_size=tc.vocab_size,
            embedding_size=tc.embedding_size,
            hidden_size=tc.rnn_hidden_size,
            rnn_type="LSTM",
            final_state_only=True,
            bidirectional=tc.bidirectional,
        )
        self.rgb_encoder = TorchVisionResNet(
            version=c.image_encoder.rgb.model_name,
            output_size=c.image_encoder.rgb.output_size,
            normalize_visual_inputs=c.normalize_rgb,
            spatial_output=False,
        )
        self.depth_encoder = VlnResnetDepthEncoder(
            output_size=c.image_encoder.depth.output_size, spatial_output=False
        )
        if self.use_prev_action:
            self.prev_action_embed = nn.Embed(c.num_actions + 1, 32)
        self.state_encoder = RNNStateEncoder(
            input_size=(
                self.instruction_encoder.output_size
                + c.image_encoder.depth.output_size
                + c.image_encoder.rgb.output_size
                + (32 if self.use_prev_action else 0)
            ),
            hidden_size=c.state_encoder.hidden_size,
            rnn_type=c.state_encoder.rnn_type,
        )
        self.progress_monitor = nn.Dense(1)
        self.action_head = nn.Dense(c.num_actions)

    def __call__(self, observations, rnn_states, prev_actions, masks):
        rgb = observations["rgb"]
        seq_mode = rgb.ndim == 5
        if seq_mode:
            T, N = rgb.shape[:2]
            flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        else:
            T, N = 1, rgb.shape[0]
            flat = lambda x: x

        instr = self.instruction_encoder(flat(observations["instruction"]))  # (B, Ct)
        rgb_f = self.rgb_encoder(flat(rgb))  # (B, rgb_out)
        depth_f = self.depth_encoder(flat(observations["depth"]))  # (B, depth_out)
        feats = [instr, depth_f, rgb_f]
        if self.use_prev_action:
            pa = flat(prev_actions).reshape(-1)
            m = flat(masks).reshape(-1)
            idx = ((pa.astype(jnp.float32) + 1.0) * m.astype(jnp.float32)).astype(jnp.int32)
            feats.append(self.prev_action_embed(idx))
        x = jnp.concatenate(feats, axis=1)
        if seq_mode:
            x = x.reshape(T, N, -1)
        out, h = self.state_encoder(x, rnn_states, masks)
        out_flat = out.reshape(-1, out.shape[-1]) if seq_mode else out
        logits = self.action_head(out_flat)
        progress = jnp.tanh(self.progress_monitor(out_flat))
        if seq_mode:
            logits = logits.reshape(T, N, -1)
            progress = progress.reshape(T, N, -1)
        return logits, h, progress


class Seq2SeqPolicy(Policy):
    name = "Seq2Seq_Policy"
    TORCH_CONVERTER_NAME = "convert_seq2seq_policy"

    @classmethod
    def build(cls, cfg: ModelCfg, rng: Optional[jax.Array] = None) -> "Seq2SeqPolicy":
        module = Seq2SeqNet(cfg=cfg)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        obs = {
            "instruction": jnp.zeros((1, 8), jnp.int32),
            "rgb": jnp.zeros((1, 224, 224, 3), jnp.float32),
            "depth": jnp.zeros((1, 256, 256, 1), jnp.float32),
        }
        params = module.init(
            rng, obs, jnp.zeros((1, 1, cfg.state_encoder.hidden_size)),
            jnp.zeros((1,), jnp.int32), jnp.ones((1,)),
        )["params"]
        return cls(module, params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[ModelCfg] = None) -> "Seq2SeqPolicy":
        cfg = cls.load_config(path, default=cfg)
        pol = cls.build(cfg)
        pol.params = cls.load_params_file(path, pol.params)
        return pol

    def num_recurrent_layers(self) -> int:
        return 1

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
