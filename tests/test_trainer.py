"""Trainer tests: loss decreases on a fixed batch; checkpoint save/resume;
FSDP sharding on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from internnav_tpu.configs.trainer import ExpCfg, MeshCfg
from internnav_tpu.model.base import Policy
from internnav_tpu.model.basemodel.cma import CMANet
from internnav_tpu.model import get_config
from internnav_tpu.trainer.cma_trainer import CMATrainer, inflection_weighted_ce


def tiny_policy(cfg_model):
    net = CMANet(cfg=cfg_model)
    obs0 = {
        "instruction": jnp.zeros((1, 8), jnp.int32),
        "rgb": jnp.zeros((1, 64, 64, 3), jnp.float32),
        "depth": jnp.zeros((1, 128, 128, 1), jnp.float32),
    }
    params = net.init(
        jax.random.PRNGKey(0), obs0,
        jnp.zeros((1, 2, cfg_model.state_encoder.hidden_size)),
        jnp.zeros((1,), jnp.int32), jnp.ones((1,)),
    )["params"]
    return Policy(net, params, cfg_model)


def tiny_batch(T=2, N=8, seed=0):
    rs = np.random.RandomState(seed)
    obs = {
        "instruction": rs.randint(1, 50, (T, N, 8)).astype(np.int32),
        "rgb": rs.randint(0, 255, (T, N, 64, 64, 3)).astype(np.float32),
        "depth": rs.rand(T, N, 128, 128, 1).astype(np.float32),
        "progress": rs.rand(T, N, 1).astype(np.float32),
    }
    return {
        "observations": obs,
        "corrected_actions": rs.randint(0, 4, (T, N)),
        "weights": np.ones((T, N), np.float32),
        "prev_actions": rs.randint(0, 4, (T, N)).astype(np.int32),
        "masks": np.ones((T, N), np.float32),
    }


def test_inflection_weighted_ce_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(3, 2, 4).astype(np.float32))
    actions = jnp.asarray([[0, 1], [2, 3], [1, 0]])
    w = jnp.asarray([[1.0, 3.2], [1.0, 1.0], [3.2, 1.0]])
    got = inflection_weighted_ce(logits, actions, w)
    log_p = jax.nn.log_softmax(logits)
    ce = -np.take_along_axis(np.asarray(log_p), np.asarray(actions)[..., None], -1)[..., 0]
    expect = ((np.asarray(w) * ce).sum(0) / np.asarray(w).sum(0)).mean()
    np.testing.assert_allclose(float(got), expect, rtol=1e-6)


@pytest.mark.slow
def test_cma_train_loss_decreases_and_resumes(tmp_path):
    cfg = ExpCfg(
        name="t", model_name="cma", model=get_config("cma"),
        mesh=MeshCfg(axes={"dp": 8}, param_sharding="fsdp"),
        output_dir=str(tmp_path),
    )
    cfg.il.lr = 3e-4
    cfg.il.log_interval_steps = 100
    cfg.il.save_interval_steps = 1000
    policy = tiny_policy(cfg.model)
    batch = tiny_batch()
    trainer = CMATrainer(cfg, policy, dataset=[batch] * 8, total_steps=8)
    step = trainer.build_train_step()
    b = trainer.shard_batch(batch)
    rng = jax.random.PRNGKey(0)
    params, opt = trainer.params, trainer.opt_state
    losses = []
    for _ in range(6):
        params, opt, m = step(params, opt, b, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    # checkpoint round trip
    trainer.params, trainer.opt_state, trainer.step = params, opt, 6
    trainer.save_checkpoint()
    t2 = CMATrainer(cfg, tiny_policy(cfg.model), dataset=[], total_steps=8)
    assert t2.maybe_restore()
    assert t2.step == 6
    p_leaf = jax.tree_util.tree_leaves(params)[0]
    r_leaf = jax.tree_util.tree_leaves(t2.params)[0]
    np.testing.assert_allclose(np.asarray(p_leaf), np.asarray(r_leaf))


def test_fsdp_sharding_covers_large_params():
    from internnav_tpu.parallel.mesh import fsdp_param_sharding, make_mesh

    mesh = make_mesh({"dp": 8})
    params = {
        "big": np.zeros((1024, 256), np.float32),
        "small": np.zeros((4,), np.float32),
    }
    sh = fsdp_param_sharding(mesh, params)
    assert "dp" in str(sh["big"].spec)
    assert sh["small"].spec == jax.sharding.PartitionSpec()


# -------------------------------------------------- grad accumulation / EMA
class _ToyTrainer:
    """Minimal Trainer subclass: quadratic loss, rng-independent (so
    accumulated-vs-large-batch gradients are exactly comparable)."""

    def __new__(cls, accum: int, use_ema: bool = False, tmp=None):
        from types import SimpleNamespace

        from internnav_tpu.trainer.base import Trainer

        class Toy(Trainer):
            def loss_fn(self, params, batch, rng):
                pred = batch["x"] @ params["w"]
                loss = jnp.mean((pred - batch["y"]) ** 2)
                return loss, {"mse": loss}

        cfg = ExpCfg(name="toy", mesh=MeshCfg(axes={"dp": 8}),
                     output_dir=str(tmp) if tmp else "logs/toy")
        cfg.il.grad_accum_steps = accum
        cfg.il.use_ema = use_ema
        cfg.il.lr = 1e-2
        cfg.il.lr_schedule = "constant"
        rs = np.random.RandomState(0)
        policy = SimpleNamespace(params={"w": jnp.asarray(rs.randn(4, 3), jnp.float32)})
        return Toy(cfg, policy, dataset=None, total_steps=10)


def _toy_batch():
    rs = np.random.RandomState(1)
    return {"x": rs.randn(16, 4).astype(np.float32),
            "y": rs.randn(16, 3).astype(np.float32)}


def test_grad_accum_matches_large_batch():
    """One optimizer step over 4 accumulated microbatches == one step over
    the full batch (mean-loss semantics; reference inherits this from HF
    TrainingArguments.gradient_accumulation_steps)."""
    batch = _toy_batch()
    t1 = _ToyTrainer(accum=1)
    t4 = _ToyTrainer(accum=4)
    rng = jax.random.PRNGKey(0)
    p1, _, m1 = t1.build_train_step()(t1.params, t1.opt_state,
                                      t1.shard_batch(batch), rng)
    p4, _, m4 = t4.build_train_step()(t4.params, t4.opt_state,
                                      t4.shard_batch(batch), rng)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p4["w"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m4["grad_norm"]),
                               rtol=1e-4)


def test_ema_tracked_and_checkpointed(tmp_path):
    t = _ToyTrainer(accum=1, use_ema=True, tmp=tmp_path)
    t.dataset = [_toy_batch()] * 3
    t.total_steps = 3
    t.train(resume=False)
    assert t.ema_params is not None
    # power-warmup decay is ~0 at early steps: EMA hugs params but is a
    # live tree that restores from the checkpoint
    t2 = _ToyTrainer(accum=1, use_ema=True, tmp=tmp_path)
    assert t2.maybe_restore()
    np.testing.assert_allclose(np.asarray(t2.ema_params["w"]),
                               np.asarray(t.ema_params["w"]), rtol=1e-6)
    assert t2.step == 3


def _adam_cfg(opt_state_dtype=None):
    exp = ExpCfg(name="t", model_name="cma", output_dir="/tmp/x",
                 mesh=MeshCfg(axes={"dp": 1}))
    exp.il.lr_schedule = "constant"
    exp.il.lr = 1e-2
    exp.il.weight_decay = 0.01
    exp.il.opt_state_dtype = opt_state_dtype
    return exp


def _run_adam(exp, steps=5):
    from internnav_tpu.trainer.base import make_optimizer

    rs = np.random.RandomState(0)
    params = {"w": jnp.asarray(rs.randn(8, 8), jnp.float32),
              "bias": jnp.asarray(rs.randn(8), jnp.float32)}
    tx = make_optimizer(exp, total_steps=100)
    state = tx.init(params)
    del rs
    for i in range(steps):
        # identical grad sequence across calls: reseed per step
        rs2 = np.random.RandomState(100 + i)
        grads = {"w": jnp.asarray(rs2.randn(8, 8), jnp.float32),
                 "bias": jnp.asarray(rs2.randn(8), jnp.float32)}
        updates, state = tx.update(grads, state, params)
        import optax
        params = optax.apply_updates(params, updates)
    return params, state


def test_opt_state_dtype_fp32_matches_stock_adamw():
    """scale_by_adam_sd at fp32 storage IS optax.adamw: same chain, same
    math (bias correction, eps placement, decay masking on 'bias')."""
    ref, _ = _run_adam(_adam_cfg(None))
    got, _ = _run_adam(_adam_cfg("fp32"))
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(ref["w"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["bias"]),
                               np.asarray(ref["bias"]), rtol=1e-6, atol=1e-7)


def test_opt_state_dtype_bf16_halves_state_and_tracks_fp32():
    """bf16 moment storage: m/v leaves ARE bfloat16 (the 2x optimizer-HBM
    saving bench_train relies on) and the resulting params stay within
    bf16-mantissa error of the fp32-state trajectory."""
    ref, _ = _run_adam(_adam_cfg(None))
    got, state = _run_adam(_adam_cfg("bf16"))
    adam_state = state[1]  # chain: (clip, adam_sd, decay, lr)
    for leaf in jax.tree_util.tree_leaves((adam_state.mu, adam_state.nu)):
        assert leaf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(ref["w"]),
                               rtol=0, atol=5e-2)
