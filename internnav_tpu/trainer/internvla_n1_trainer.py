"""InternVLA-N1 finetuning trainer.

Reference parity (internnav/trainer/internvla_n1_trainer.py:125-239 +
qwenvl_base.py): selective unfreezing via tune_mm_vision / tune_mm_mlp /
tune_llm flags with System-1 modules always trainable (set_model :78-122),
sequence packing with cu_seqlens attention (data_flatten →
replace_qwen2_vl_attention_class :18-104 — here the packed batch's segment
ids feed the Pallas flash-attention kernel directly), LM cross-entropy on
label-masked tokens + flow-matching System-1 loss (internvla_n1.py:234-303).

TPU-native sharding: params FSDP-sharded over the mesh dp axis (the
DeepSpeed ZeRO-2/3 equivalent, train_dual_system.sh:16); frozen params are
masked out of the optimizer with optax.multi_transform (zero updates).
Vision encoding runs host-jitted outside the train step when the vision
tower is frozen (the reference default), keeping the packed-LM step dense.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from internnav_tpu.dataset.internvla_n1_dataset import IGNORE_INDEX
from internnav_tpu.ops.rope import get_rope_index_25
from internnav_tpu.trainer.base import Trainer


def trainability_labels(params: Dict, *, tune_llm: bool = False,
                        tune_mm_vision: bool = False) -> Dict:
    """'train' / 'freeze' label tree (reference set_model semantics:
    System-1 heads + latent queries always train)."""
    always_train_roots = {
        "traj_dit", "action_encoder", "action_decoder", "cond_projector_0",
        "cond_projector_1", "memory_encoder", "rgb_resampler", "memory_proj",
        "navdp", "latent_queries", "rgb_model",
    }

    def label(path, _):
        root = path[0].key if hasattr(path[0], "key") else str(path[0])
        if root == "language_model":
            return "train" if tune_llm else "freeze"
        if root == "visual":
            return "train" if tune_mm_vision else "freeze"
        return "train"

    _ = always_train_roots
    return jax.tree_util.tree_map_with_path(label, params)


def gather_traj_blocks(hidden, input_ids, traj_poses, traj_mask,
                       traj_token_index: int, n_query: int):
    """Align traj-token hidden states with their per-sample targets.

    Packed batches interleave traj-bearing samples with STOP/turn samples
    that contribute zero traj tokens, so the hidden-side compaction (stable
    sort putting traj-token positions first) packs the k-th traj-BEARING
    sample's n_query block into slot k. The target side (traj_poses /
    traj_mask, indexed by packed-sample order) must be compacted with the
    same stable sort so slot k pairs with the k-th traj-bearing sample;
    trailing garbage slots get loss mask 0.

    Returns (traj_hidden [N, n_query, D], traj_poses_c [N, P, 3],
    loss_mask_c [N]) with N = traj_poses.shape[0].
    """
    n_rows = traj_poses.shape[0]
    B, T, D = hidden.shape
    flat_hidden = hidden.reshape(B * T, D)
    flat_mask = (input_ids == traj_token_index).reshape(-1)
    order = jnp.argsort(~flat_mask, stable=True)  # traj positions first
    take = order[: n_rows * n_query]
    traj_hidden = flat_hidden[take].reshape(n_rows, n_query, D)
    sample_has_traj = jnp.asarray(traj_mask).astype(bool)
    rows = jnp.argsort(~sample_has_traj, stable=True)
    return traj_hidden, jnp.asarray(traj_poses)[rows], \
        sample_has_traj[rows].astype(jnp.float32)


class InternVLAN1Trainer(Trainer):
    batch_axis = 0

    def __init__(self, cfg, policy, dataset=None, total_steps: Optional[int] = None,
                 tune_llm: bool = True, tune_mm_vision: bool = False):
        self.tune_llm = tune_llm
        self.tune_mm_vision = tune_mm_vision
        # il.remat is applied HERE, at the trainer/config boundary: a policy
        # built without decoder-layer rematerialization (the serving default)
        # still gets it from the training config — the knob that fits
        # packed-8192 full-vocab steps on a 16 GB chip. Safe post-build:
        # nn.remat preserves the param tree exactly (pinned in
        # tests/test_n1_trainer.py) and the model is only traced at the
        # first train step.
        if bool(getattr(cfg.il, "remat", False)) and not policy.cfg.text.remat:
            import dataclasses as _dc

            from internnav_tpu.model.basemodel.internvla_n1.model import (
                InternVLAN1Model,
            )

            policy.cfg = _dc.replace(
                policy.cfg, text=_dc.replace(policy.cfg.text, remat=True))
            policy.model = InternVLAN1Model(policy.cfg)
        super().__init__(cfg, policy, dataset, total_steps)

    def _wrap_tx(self, tx):
        """Mask the optimizer to the trainable subtrees BEFORE any opt
        state materializes (base.__init__ calls this pre-init): the frozen
        towers get set_to_zero (no moments), so Adam state is allocated
        for the 1.56B trainable params only — never transiently for the
        full 2.2B tree."""
        labels = trainability_labels(self.policy.params,
                                     tune_llm=self.tune_llm,
                                     tune_mm_vision=self.tune_mm_vision)
        return optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )

    # ------------------------------------------------------------ host prep
    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host side: encode images (frozen tower), build position ids."""
        from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
            preprocess_images, rotary_table, vision_indices,
        )

        pol = self.policy
        cfg = pol.cfg
        img_tokens = []
        grids = []
        for imgs in batch["images"]:
            toks, grid = pol._encode_images(np.asarray(imgs))
            # keep tokens DEVICE-resident: fetching them to host only to
            # re-upload in loss_fn would round-trip ~50 MB per packed-8192
            # batch through the host link (seconds on a tunneled chip)
            img_tokens.append(toks)
            grids.append(grid)
        all_grid = np.concatenate(grids, axis=0)
        input_ids = batch["input_ids"]
        pos_ids, _ = get_rope_index_25(
            input_ids, all_grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_index,
        )
        return {
            "input_ids": input_ids,
            "labels": batch["labels"],
            "segment_ids": batch.get("segment_ids"),
            "position_ids": pos_ids,
            "image_embeds": jnp.concatenate(img_tokens, axis=0),
            "traj_poses": batch["traj_poses"],
            "traj_mask": batch["traj_mask"].astype(np.float32),
        }

    # -------------------------------------------------------------- loss
    def loss_fn(self, params, batch, rng) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        pol = self.policy
        cfg = pol.cfg
        input_ids = jnp.asarray(batch["input_ids"])
        labels = jnp.asarray(batch["labels"])
        seg = batch.get("segment_ids")
        seg = jnp.asarray(seg) if seg is not None else None

        ce_chunk = int(getattr(self.cfg.il, "ce_chunk", 0) or 0)

        def fwd(mdl):
            embeds = mdl.embed_multimodal(input_ids, jnp.asarray(batch["image_embeds"]))
            logits, hidden, _ = mdl.prefill(
                embeds, jnp.asarray(batch["position_ids"]), segment_ids=seg,
                compute_logits=(ce_chunk == 0),
            )
            if ce_chunk:
                # full-vocab CE without the (B, T, vocab) fp32 logits
                # buffer: lm_head + softmax-CE per ce_chunk-token chunk
                # under jax.checkpoint (qwen_text.chunked_ce)
                lm = mdl.language_model.chunked_ce(
                    hidden, labels, ignore_index=IGNORE_INDEX,
                    chunk=ce_chunk)
                return lm, hidden
            return logits, hidden

        logits, hidden = pol.model.apply({"params": params}, method=fwd)

        if ce_chunk:
            lm_loss = logits  # fwd returned the chunked CE directly
        else:
            # next-token LM loss on supervised positions
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            valid = shift_labels != IGNORE_INDEX
            safe = jnp.where(valid, shift_labels, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(shift_logits, safe)
            lm_loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1)

        # System-1 loss on traj-token hidden states
        s1_loss = jnp.zeros(())
        n_traj_rows = batch["traj_poses"].shape[0]
        if "nextdit" in cfg.system1 and n_traj_rows:
            traj_hidden, traj_poses, traj_loss_mask = gather_traj_blocks(
                hidden, input_ids, batch["traj_poses"], batch["traj_mask"],
                cfg.traj_token_index, cfg.n_query,
            )

            def s1(mdl):
                return mdl.traj_loss_nextdit(
                    traj_hidden, traj_poses, rng,
                    images_dp=None,
                    loss_mask=traj_loss_mask,
                )

            s1_loss = pol.model.apply({"params": params}, method=s1)

        loss = lm_loss + s1_loss
        return loss, {"lm_loss": lm_loss, "s1_loss": s1_loss}

    def train_on_batches(self, batches: List[Dict[str, Any]], rng=None):
        """Convenience loop over prepared host batches."""
        step_fn = self.build_train_step()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        metrics = {}
        for raw in batches:
            rng, sub = jax.random.split(rng)
            # host-side vision encode must read live (non-donated) buffers
            self.policy.params = self.params
            prepared = self.prepare_batch(raw)
            self.params, self.opt_state, metrics = step_fn(
                self.params, self.opt_state, prepared, sub
            )
            self.step += 1
        self.policy.params = self.params
        return {k: float(v) for k, v in metrics.items()}
