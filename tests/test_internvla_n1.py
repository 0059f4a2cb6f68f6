"""InternVLA-N1 tests: Qwen decoder parity, M-RoPE indices, vision tower,
dual-system policy + agent (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from internnav_tpu.model.basemodel.internvla_n1.model import (
    InternVLAN1Config,
    InternVLAN1Model,
)
from internnav_tpu.model.basemodel.internvla_n1.policy import (
    InternVLAN1Policy,
    SimpleTokenizer,
)
from internnav_tpu.model.basemodel.internvla_n1.qwen_text import (
    QwenTextConfig,
    QwenTextModel,
    greedy_generate,
    pad_caches,
)
from internnav_tpu.model.utils.vln_utils import (
    chunk_token,
    parse_actions,
    split_and_clean,
    traj_to_actions,
)
from internnav_tpu.ops.rope import get_rope_index_25


@pytest.fixture(scope="module")
def text_model():
    cfg = QwenTextConfig.tiny()
    model = QwenTextModel(cfg)
    B, T = 2, 10
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (B, T))
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), pos,
                        method=model.init_all)["params"]
    return cfg, model, params, ids, pos


def test_decode_matches_prefill(text_model):
    """Cached decode must produce bit-identical logits to full prefill."""
    cfg, model, params, ids, pos = text_model
    B, T = ids.shape
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=model.embed)
    logits_full, _, _ = model.apply({"params": params}, embeds, pos)
    _, _, caches = model.apply({"params": params}, embeds[:, : T - 1],
                               pos[:, :, : T - 1], return_cache=True)
    caches = pad_caches(caches, T + 2)
    step_logits, _, _ = model.apply(
        {"params": params}, embeds[:, T - 1 : T], pos[:, :, T - 1 : T],
        caches, jnp.full((B,), T - 1), method=model.decode_step,
    )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(logits_full[:, -1]), atol=2e-2, rtol=1e-3
    )


def test_greedy_generate_deterministic_and_eos(text_model):
    cfg, model, params, ids, pos = text_model
    embeds = model.apply({"params": params}, jnp.asarray(ids), method=model.embed)
    t1, l1 = greedy_generate(model, params, embeds, pos, max_new_tokens=6,
                             eos_token_ids=(3,))
    t2, l2 = greedy_generate(model, params, embeds, pos, max_new_tokens=6,
                             eos_token_ids=(3,))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert (np.asarray(l1) <= 6).all()


def test_rope_index_25_text_and_image():
    ids = np.full((1, 10), 7, np.int64)
    ids[0, 2:6] = 151655  # 4 image tokens = grid (1, 4, 4) merged 2x2
    pos, deltas = get_rope_index_25(ids, np.asarray([[1, 4, 4]]))
    assert pos.shape == (3, 1, 10)
    # text tokens 0..1 advance all streams together
    np.testing.assert_array_equal(pos[:, 0, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[:, 0, 1], [1, 1, 1])
    # image block: temporal stream constant, h/w vary
    t_stream = pos[0, 0, 2:6]
    assert (t_stream == t_stream[0]).all()
    assert pos[1, 0, 2:6].max() > 0 and pos[2, 0, 2:6].max() > 0
    # following text resumes at max+1
    assert pos[0, 0, 6] == pos[:, 0, 2:6].max() + 1


def test_vln_utils():
    assert split_and_clean("a <image>\n b <image>") == ["a", "<image>", "b", "<image>"]
    assert parse_actions("go ↑ then ← and STOP") == [1, 2, 0]
    acts = chunk_token(np.asarray([[0.3, 0, 0.0], [0.0, 0, 0.5], [0.0, 0, -0.5],
                                   [0.0, 0.0, 0.0]]))
    assert acts == [1, 2, 3, 0]
    # straight-line deltas → forward actions
    dp = np.zeros((2, 8, 3))
    dp[:, :, 0] = 1.0  # dx=0.25 after /4 scaling
    actions = traj_to_actions(dp)
    assert set(actions) == {1}


@pytest.mark.slow
def test_dual_system_policy_roundtrip():
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit_async"))
    img = np.random.RandomState(0).randint(0, 255, (56, 56, 3)).astype(np.uint8)
    out = pol.s2_step(img, "go forward", max_new_tokens=4)
    assert out.validate()
    if out.output_latent is not None:
        assert np.asarray(out.output_latent).shape == (1, pol.cfg.n_query,
                                                       pol.cfg.text.hidden_size)
        rgb2 = np.stack([img, img])[None]
        s1 = pol.s1_step_latent(rgb2, None, out.output_latent, num_sample_trajs=2)
        assert isinstance(s1.idx, list)
    # history bookkeeping
    pol.s2_step(img, "go forward", max_new_tokens=4)
    assert pol.episode_idx == 2 and len(pol.rgb_list) == 2
    pol.reset()
    assert pol.episode_idx == 0


@pytest.mark.slow
def test_dual_system_agent_sync_mode():
    from internnav_tpu.agent import Agent
    from internnav_tpu.configs import AgentCfg

    agent = Agent.init(AgentCfg(model_name="internvla_n1",
                                model_settings={"async_s2": False, "infer_mode": "sync"}))
    obs = [{
        "rgb": np.zeros((56, 56, 3), np.uint8),
        "depth": np.zeros((56, 56), np.float32),
        "instruction_text": "move ahead",
    }]
    outs = [agent.step(obs)[0]["action"][0] for _ in range(3)]
    assert all(isinstance(a, int) for a in outs)
    agent.reset()
    assert agent.action_queue == [] and agent.latent is None


@pytest.mark.slow
def test_fused_s2_prompt_bucketing_compile_count():
    """50 varied-length instructions must hit at most a handful of fused
    compiles (prompts pad to PROMPT_BUCKET multiples; VERDICT r1 #6)."""
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit"))
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (56, 56, 3)).astype(np.uint8)
    words = ["go", "left", "right", "hall", "door", "past", "the", "stairs"]
    for i in range(50):
        n_words = int(rs.randint(3, 60))
        instr = " ".join(rs.choice(words) for _ in range(n_words))
        pol.reset()
        pol.s2_step(img, instr, max_new_tokens=4, fused=True)
    fused_keys = [k for k in pol._jit_cache if k.startswith("fused_")]
    assert len(fused_keys) <= 4, fused_keys


def test_simple_tokenizer_roundtrip():
    tok = SimpleTokenizer()
    ids = tok.encode("<|im_start|>user\nhello world<|im_end|>")
    assert ids[0] == 151644 and ids[-1] == 151645
    assert len(ids) == 5  # im_start, 'user', 'hello', 'world', im_end


@pytest.mark.slow
def test_fused_s2_matches_unfused():
    """The single-program fused S2 path must reproduce the separate
    vision/generate/latents dispatches (tokens and latents)."""
    pol = InternVLAN1Policy.build(InternVLAN1Config.tiny("nextdit"))
    img = np.random.RandomState(3).randint(0, 255, (56, 56, 3)).astype(np.uint8)
    out_f = pol.s2_step(img, "go to the door", max_new_tokens=6, fused=True)
    text_f = pol.llm_output
    pol.reset()
    out_u = pol.s2_step(img, "go to the door", max_new_tokens=6, fused=False)
    text_u = pol.llm_output
    assert text_f == text_u
    if out_u.output_latent is not None:
        np.testing.assert_allclose(
            np.asarray(out_f.output_latent), np.asarray(out_u.output_latent),
            atol=2e-2, rtol=1e-2,
        )


def test_device_preprocess_matches_host():
    """On-device uint8 normalize+patchify must equal the host pipeline
    (the transfer-optimized path ships raw pixels, not fp32 patches)."""
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
        QwenVisionConfig, preprocess_images, preprocess_images_device)
    import jax.numpy as jnp

    cfg = QwenVisionConfig.tiny()
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 255, (3, 56, 56, 3)).astype(np.uint8)
    mean = InternVLAN1Policy.CLIP_MEAN
    std = InternVLAN1Policy.CLIP_STD
    norm = ((imgs.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32))
    want, grid = preprocess_images(norm.astype(np.float32), cfg)
    got = preprocess_images_device(jnp.asarray(imgs), cfg, mean, std)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6, rtol=1e-6)
    assert grid.tolist() == [[1, 4, 4]] * 3


def test_cfg_fast_path_matches_explicit_combine():
    """guidance_scale=1.0 (the reference's only used value,
    internvla_n1.py:355) takes a conditional-only fast path; it must equal
    the explicit u + s*(c - u) CFG combine up to float epsilon."""
    cfg = InternVLAN1Config.tiny("nextdit_async")
    model = InternVLAN1Model(cfg)
    params = InternVLAN1Policy._init_params(model, cfg, jax.random.PRNGKey(0),
                                            56)
    rs = np.random.RandomState(3)
    lat = jnp.asarray(rs.randn(1, cfg.n_query, cfg.text.hidden_size),
                      jnp.float32)
    imgs = jnp.asarray(rs.rand(1, 2, 56, 56, 3), jnp.float32)

    def run(scale):
        return model.apply(
            {"params": params}, lat, imgs, rng=jax.random.PRNGKey(2),
            guidance_scale=scale, num_sample_trajs=2,
            method=model.generate_traj_nextdit)

    fast = np.asarray(run(1.0))
    # nextafter(1.0) forces the explicit two-branch combine with a scale
    # that is numerically 1.0 for all practical purposes
    explicit = np.asarray(run(float(np.nextafter(1.0, 2.0))))
    np.testing.assert_allclose(fast, explicit, rtol=2e-4, atol=2e-4)


def test_decode_chunk_matches_sequential_steps(text_model):
    """decode_chunk over n fixed embeddings == n sequential decode_steps
    (stepwise-causal chunk attention + contiguous cache writes)."""
    cfg, model, params, ids, pos = text_model
    B, T = ids.shape
    n = 3
    embeds = model.apply({"params": params}, jnp.asarray(ids),
                         method=model.embed)
    _, _, caches = model.apply({"params": params}, embeds, pos,
                               return_cache=True)
    caches = pad_caches(caches, T + n)
    q = jnp.asarray(np.random.RandomState(1).randn(
        1, n, cfg.hidden_size) * 0.05, embeds.dtype)
    q = jnp.broadcast_to(q, (B, n, cfg.hidden_size))
    start = jnp.full((B,), T, jnp.int32)

    # sequential reference
    seq_caches = caches
    hs = []
    for i in range(n):
        p = jnp.broadcast_to((start + i)[None, :, None], (3, B, 1))
        _, h, seq_caches = model.apply(
            {"params": params}, q[:, i:i + 1], p, seq_caches, start + i,
            compute_logits=False, method=model.decode_step)
        hs.append(h)
    want = jnp.stack(hs, axis=1)

    pos_c = jnp.broadcast_to(start[None, :, None] + jnp.arange(n)[None, None],
                             (3, B, n)).astype(jnp.int32)
    got, chunk_caches = model.apply({"params": params}, q, pos_c, caches,
                                    start, method=model.decode_chunk)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)
    for (kc, vc), (ks, vs) in zip(chunk_caches, seq_caches):
        np.testing.assert_allclose(np.asarray(kc, np.float32),
                                   np.asarray(ks, np.float32), atol=2e-2,
                                   rtol=2e-2)
