"""InternVLA-N1 trainer test: packed batch, LM+S1 loss, selective freeze."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_gather_traj_blocks_alignment():
    """Regression: a [no-traj, traj] packed batch must pair the traj-bearing
    sample's hidden block with ITS poses under mask=1 (ADVICE round 1)."""
    from internnav_tpu.trainer.internvla_n1_trainer import gather_traj_blocks

    traj_id, n_q, D, P = 777, 3, 5, 4
    # one packed row: [stop sample tokens..., traj sample with 3 traj tokens...]
    input_ids = jnp.asarray(
        [[1, 2, 3, 4, 10, 11, traj_id, traj_id, traj_id, 12, 0, 0]]
    )
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(1, 12, D).astype(np.float32))
    traj_poses = jnp.asarray(rng.randn(2, P, 3).astype(np.float32))
    traj_mask = np.asarray([False, True])  # sample 0 = STOP, sample 1 = traj

    th, tp, lm = gather_traj_blocks(hidden, input_ids, traj_poses, traj_mask,
                                    traj_id, n_q)
    # slot 0 = the traj-bearing sample (sample 1): its hidden block and poses
    np.testing.assert_array_equal(np.asarray(th[0]), np.asarray(hidden[0, 6:9]))
    np.testing.assert_array_equal(np.asarray(tp[0]), np.asarray(traj_poses[1]))
    np.testing.assert_array_equal(np.asarray(lm), [1.0, 0.0])

    # direct per-sample gather for every masked slot must match
    direct = hidden[0, input_ids[0] == traj_id].reshape(-1, n_q, D)
    np.testing.assert_array_equal(np.asarray(th[:1]), np.asarray(direct))


@pytest.mark.slow
def test_n1_trainer_tp_fsdp_combined(tmp_path):
    """Production Trainer.__init__ with param_sharding='tp' + fsdp_rest on a
    dp=4 x tp=2 mesh: Megatron specs on the decoder, dp-FSDP on other large
    params, and one real train step (VERDICT r1 #5)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.dataset.internvla_n1_dataset import (
        N1SampleDataset,
        n1_packed_collate_fn,
        tokenize_sample,
        write_synthetic_n1_dataset,
    )
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
        SimpleTokenizer,
    )
    from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer

    cfg_model = InternVLAN1Config.tiny("nextdit")
    pol = InternVLAN1Policy.build(cfg_model, image_hw=28)
    tok = SimpleTokenizer(cfg_model.text.vocab_size)
    pol.tokenizer = tok
    exp = ExpCfg(name="n1tp", model_name="internvla_n1",
                 output_dir=str(tmp_path / "out"),
                 mesh=MeshCfg(axes={"dp": 4, "tp": 2},
                              param_sharding="tp", fsdp_rest=True))
    trainer = InternVLAN1Trainer(exp, pol, total_steps=1)

    # Megatron TP specs on the decoder
    l0 = trainer.param_sharding["language_model"]["layers_0"]
    assert l0["self_attn"]["q_proj"]["kernel"].spec == P(None, "tp")
    assert l0["self_attn"]["o_proj"]["kernel"].spec == P("tp", None)
    assert l0["mlp"]["down_proj"]["kernel"].spec == P("tp", None)

    # fsdp_rest: every large divisible non-LLM param is dp-sharded
    found_dp = []

    def check(path, sh):
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        if keys[0] != "language_model" and "dp" in jax.tree_util.tree_leaves(
                [s for s in sh.spec if s]):
            found_dp.append(keys)

    jax.tree_util.tree_map_with_path(check, trainer.param_sharding)
    assert found_dp, "fsdp_rest sharded nothing outside the decoder"

    # one real sharded train step through the packed pipeline
    path = write_synthetic_n1_dataset(str(tmp_path / "store.bin"),
                                      n_episodes=2, T=6, hw=28)
    ds = N1SampleDataset(path, predict_step_nums=cfg_model.predict_step_nums,
                         num_history=2)
    tpi = pol._tokens_per_image((28, 28))
    rows = [tokenize_sample(s, tok, tokens_per_image=tpi,
                            n_query=cfg_model.n_query) for s in list(ds)[:2]]
    batch = n1_packed_collate_fn(rows, max_len=256,
                                 predict_step_nums=cfg_model.predict_step_nums)
    m = trainer.train_on_batches([batch])
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_n1_trainer_step_and_freeze(tmp_path):
    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.dataset.internvla_n1_dataset import (
        N1SampleDataset,
        n1_packed_collate_fn,
        tokenize_sample,
        write_synthetic_n1_dataset,
    )
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
        SimpleTokenizer,
    )
    from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer

    path = write_synthetic_n1_dataset(str(tmp_path / "store.bin"),
                                      n_episodes=2, T=6, hw=28)
    cfg_model = InternVLAN1Config.tiny("nextdit")
    pol = InternVLAN1Policy.build(cfg_model, image_hw=28)
    tok = SimpleTokenizer(cfg_model.text.vocab_size)
    pol.tokenizer = tok
    tpi = pol._tokens_per_image((28, 28))
    ds = N1SampleDataset(path, predict_step_nums=cfg_model.predict_step_nums,
                         num_history=2)
    rows = []
    for s in ds:
        rows.append(tokenize_sample(s, tok, tokens_per_image=tpi,
                                    n_query=cfg_model.n_query))
        if len(rows) >= 2:
            break
    batch = n1_packed_collate_fn(rows, max_len=256,
                                 predict_step_nums=cfg_model.predict_step_nums)

    v_init = np.array(jax.tree_util.tree_leaves(pol.params["visual"])[0])
    l_init = np.array(jax.tree_util.tree_leaves(pol.params["language_model"])[0])

    exp = ExpCfg(name="n1t", model_name="internvla_n1",
                 output_dir=str(tmp_path / "out"),
                 mesh=MeshCfg(axes={"dp": 8}, param_sharding="fsdp"))
    trainer = InternVLAN1Trainer(exp, pol, total_steps=2, tune_llm=True,
                                 tune_mm_vision=False)
    m = trainer.train_on_batches([batch, batch])
    assert np.isfinite(m["lm_loss"]) and np.isfinite(m["s1_loss"])

    v_after = np.array(jax.tree_util.tree_leaves(trainer.params["visual"])[0])
    l_after = np.array(jax.tree_util.tree_leaves(trainer.params["language_model"])[0])
    np.testing.assert_array_equal(v_init, v_after)  # frozen vision tower
    assert not np.allclose(l_init, l_after)  # trainable LLM updated


@pytest.mark.slow
def test_n1_finetune_entry_script(tmp_path):
    """The config-driven finetune CLI (VERDICT r2 #4: reference torchrun
    entry internvla_n1_trainer.py:125-239) assembles tokenizer/dataset/mesh/
    trainer and trains end-to-end on the CPU mesh, including checkpointing."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from internnav_tpu.dataset.internvla_n1_dataset import (
        write_synthetic_n1_dataset,
    )
    from scripts.train.train_n1 import main

    store = write_synthetic_n1_dataset(str(tmp_path / "store.bin"),
                                       n_episodes=2, T=6, hw=28)
    out = str(tmp_path / "out")
    metrics = main([
        "--tiny", "--store", store, "--steps", "2", "--batch-size", "2",
        "--max-len", "256", "--num-history", "2", "--grad-accum", "1",
        "--output-dir", out, "--no-resume",
    ])
    assert np.isfinite(metrics["loss"])
    # a checkpoint landed (orbax save on final step)
    assert any(Path(out).rglob("*"), ), "no checkpoint written"


def test_n1_trainer_remat_matches_no_remat(tmp_path):
    """cfg.text.remat=True rematerializes decoder layers in backward
    (jax.checkpoint) without changing the param tree OR the computed
    update: losses and updated params match the non-remat step to
    float epsilon. This is the knob train_n1.py wires from ILCfg.remat
    for packed-8192 single-chip steps."""
    import dataclasses

    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.dataset.internvla_n1_dataset import (
        N1SampleDataset,
        n1_packed_collate_fn,
        tokenize_sample,
        write_synthetic_n1_dataset,
    )
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
        InternVLAN1Model,
    )
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
        SimpleTokenizer,
    )
    from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer

    path = write_synthetic_n1_dataset(str(tmp_path / "store.bin"),
                                      n_episodes=2, T=6, hw=28)
    cfg_plain = InternVLAN1Config.tiny("nextdit")
    cfg_remat = dataclasses.replace(
        cfg_plain, text=dataclasses.replace(cfg_plain.text, remat=True))

    def run(cfg_model):
        pol = InternVLAN1Policy.build(cfg_model, image_hw=28)
        tok = SimpleTokenizer(cfg_model.text.vocab_size)
        pol.tokenizer = tok
        tpi = pol._tokens_per_image((28, 28))
        ds = N1SampleDataset(path,
                             predict_step_nums=cfg_model.predict_step_nums,
                             num_history=2)
        rows = [tokenize_sample(s, tok, tokens_per_image=tpi,
                                n_query=cfg_model.n_query)
                for s in list(ds)[:2]]
        batch = n1_packed_collate_fn(
            rows, max_len=256,
            predict_step_nums=cfg_model.predict_step_nums)
        exp = ExpCfg(name="n1r", model_name="internvla_n1",
                     output_dir=str(tmp_path / f"out_{cfg_model.text.remat}"),
                     mesh=MeshCfg(axes={"dp": 8}, param_sharding="fsdp"))
        trainer = InternVLAN1Trainer(exp, pol, total_steps=1, tune_llm=True,
                                     tune_mm_vision=False)
        m = trainer.train_on_batches([batch])
        leaf = np.array(
            jax.tree_util.tree_leaves(trainer.params["language_model"])[0])
        return m, leaf

    # the param trees are built from the same PRNGKey and the remat wrapper
    # preserves module names, so both runs start from identical params
    m_plain, leaf_plain = run(cfg_plain)
    m_remat, leaf_remat = run(cfg_remat)
    np.testing.assert_allclose(m_remat["lm_loss"], m_plain["lm_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(leaf_remat, leaf_plain, rtol=1e-4, atol=1e-6)


def test_n1_trainer_chunked_ce_matches_full_logits(tmp_path):
    """il.ce_chunk>0 computes the SAME mean CE (and the same update) as the
    classic full-logits path while never materializing (B, T, vocab)
    logits — lm_head + softmax-CE per chunk under jax.checkpoint
    (qwen_text.chunked_ce). chunk=96 does not divide T, exercising the
    ignore-padded tail."""
    from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
    from internnav_tpu.dataset.internvla_n1_dataset import (
        N1SampleDataset,
        n1_packed_collate_fn,
        tokenize_sample,
        write_synthetic_n1_dataset,
    )
    from internnav_tpu.model.basemodel.internvla_n1.model import InternVLAN1Config
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
        SimpleTokenizer,
    )
    from internnav_tpu.trainer.internvla_n1_trainer import InternVLAN1Trainer

    path = write_synthetic_n1_dataset(str(tmp_path / "store.bin"),
                                      n_episodes=2, T=6, hw=28)
    cfg_model = InternVLAN1Config.tiny("nextdit")

    def run(ce_chunk):
        pol = InternVLAN1Policy.build(cfg_model, image_hw=28)
        tok = SimpleTokenizer(cfg_model.text.vocab_size)
        pol.tokenizer = tok
        tpi = pol._tokens_per_image((28, 28))
        ds = N1SampleDataset(path,
                             predict_step_nums=cfg_model.predict_step_nums,
                             num_history=2)
        rows = [tokenize_sample(s, tok, tokens_per_image=tpi,
                                n_query=cfg_model.n_query)
                for s in list(ds)[:2]]
        batch = n1_packed_collate_fn(
            rows, max_len=256,
            predict_step_nums=cfg_model.predict_step_nums)
        exp = ExpCfg(name="n1c", model_name="internvla_n1",
                     output_dir=str(tmp_path / f"out_ce{ce_chunk}"),
                     mesh=MeshCfg(axes={"dp": 8}, param_sharding="fsdp"))
        exp.il.ce_chunk = ce_chunk
        trainer = InternVLAN1Trainer(exp, pol, total_steps=1, tune_llm=True,
                                     tune_mm_vision=False)
        m = trainer.train_on_batches([batch])
        leaf = np.array(
            jax.tree_util.tree_leaves(trainer.params["language_model"])[0])
        return m, leaf

    m_full, leaf_full = run(0)
    m_chunk, leaf_chunk = run(96)
    np.testing.assert_allclose(m_chunk["lm_loss"], m_full["lm_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(leaf_chunk, leaf_full, rtol=1e-4, atol=1e-6)
