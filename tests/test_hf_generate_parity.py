"""END-TO-END greedy-decode parity vs HF `generate`.

The north star (BASELINE.md) claims bit-for-bit greedy decoding vs the
PyTorch reference. The reference's entire System-2 inference goes through
HF `Qwen2_5_VLForConditionalGeneration.generate`
(/root/reference/internnav/model/basemodel/internvla_n1/
internvla_n1_policy.py:169-176) with the M-RoPE rope-delta cached-decode
path (internvla_n1.py:178-204). These tests convert a tiny (structure-
identical) HF checkpoint and assert TOKEN-FOR-TOKEN equality of

  HF .generate(do_sample=False)  vs  qwen_text.greedy_generate

through the production fused program (vision encode -> multimodal embed
scatter -> prefill -> while-loop KV decode -> chunked traj-latent decode),
across 1/4/9-image prompts, including EOS early-stop and the rope-delta
decode positions; and numerical equality of the traj-query latents vs an
HF full-prefill over [prompt, generated, queries].
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from internnav_tpu.model.weights.convert import (
    convert_qwen25vl_text,
    convert_qwen25vl_vision,
)

VOCAB = 512
VS, VE, IMG_TOK, TRAJ_TOK = 506, 507, 508, 509
EOS, PAD = 510, 511
HW = 56  # -> grid (1,4,4), 4 merged tokens/image
TOK_PER_IMG = 4
MAX_NEW = 24


def _torch_sd_to_numpy(module):
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def hf_vlm():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLTextConfig,
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    text_cfg = Qwen2_5_VLTextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        tie_word_embeddings=False,
    )
    vis_cfg = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
        window_size=56, fullatt_block_indexes=[1], out_hidden_size=64,
        hidden_act="silu",
    )
    cfg = Qwen2_5_VLConfig(
        text_config=text_cfg.to_dict(), vision_config=vis_cfg.to_dict(),
        image_token_id=IMG_TOK, video_token_id=TRAJ_TOK,
        vision_start_token_id=VS, vision_end_token_id=VE,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model


def _our_model_and_params(hf):
    """Tiny InternVLAN1Model with the HF weights merged in (fp32)."""
    from internnav_tpu.model.base import merge_params
    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
        InternVLAN1Model,
    )
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.model.basemodel.internvla_n1.qwen_text import QwenTextConfig
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import QwenVisionConfig

    text = QwenTextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, mrope_section=(2, 3, 3), dtype=jnp.float32)
    vision = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64,
        dtype=jnp.float32)
    cfg = InternVLAN1Config(
        text=text, vision=vision, system1="nextdit", n_query=2,
        predict_step_nums=8, image_token_index=IMG_TOK,
        traj_token_index=TRAJ_TOK)
    model = InternVLAN1Model(cfg)
    params = InternVLAN1Policy._init_params(
        model, cfg, jax.random.PRNGKey(0), HW)
    sd = _torch_sd_to_numpy(hf)
    params = merge_params(params, {
        "language_model": convert_qwen25vl_text(sd),
        "visual": convert_qwen25vl_vision(sd),
    })
    return model, cfg, jax.device_put(params)


def _prompt_ids(rs, n_images: int, n_text: int = 7) -> np.ndarray:
    """A chat-shaped prompt: text, n image blocks, trailing text."""
    ids = list(rs.randint(3, 490, size=3))
    for _ in range(n_images):
        ids += [VS] + [IMG_TOK] * TOK_PER_IMG + [VE]
    ids += list(rs.randint(3, 490, size=n_text))
    return np.asarray(ids, np.int64)


def _pixel_inputs(rs, n_images: int):
    """Random images -> (HF pixel_values patches, grid, our uint8 stack)."""
    from internnav_tpu.model.basemodel.internvla_n1.qwen_vision import (
        QwenVisionConfig,
        preprocess_images,
    )

    imgs = rs.randint(0, 255, (n_images, HW, HW, 3)).astype(np.uint8)
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073])
    std = np.asarray([0.26862954, 0.26130258, 0.27577711])
    norm = ((imgs.astype(np.float32) / 255.0) - mean) / std
    cfg = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        window_size=56, fullatt_block_indexes=(1,), out_hidden_size=64,
        dtype=jnp.float32)
    patches, grid = preprocess_images(norm.astype(np.float32), cfg)
    return patches, grid, imgs


def _hf_generate(hf, ids, patches, grid, max_new=MAX_NEW):
    ids_t = torch.tensor(ids)
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids_t,
            attention_mask=torch.ones_like(ids_t),
            pixel_values=torch.tensor(np.asarray(patches), dtype=torch.float32),
            image_grid_thw=torch.tensor(np.asarray(grid)),
            do_sample=False, max_new_tokens=max_new,
            eos_token_id=EOS, pad_token_id=PAD, use_cache=True,
        )
    return out[:, ids.shape[1]:].numpy()


def _ours_generate(model, cfg, params, ids, imgs, max_new=MAX_NEW,
                   return_latents=False):
    """The production fused S2 program (policy._fused_s2_fn) on unpadded
    prompts: vision encode -> embed scatter -> prefill -> KV-cached greedy
    while_loop -> chunked traj-latent decode."""
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.ops.rope import get_rope_index_25

    policy = InternVLAN1Policy(model, params, cfg)
    policy.tokenizer.eos_token_id = EOS
    img_tokens, grid = policy._encode_images(imgs)
    B, T = ids.shape
    grid_all = np.tile(np.asarray(grid[:1]), ((ids == IMG_TOK).sum() // TOK_PER_IMG, 1))
    pos_ids, rope_deltas = get_rope_index_25(
        ids, grid_all, spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=IMG_TOK)
    fn = policy._fused_s2_fn(max_new, cfg.n_query)
    tokens, lengths, latents = fn(
        params, img_tokens, jnp.asarray(ids), jnp.asarray(pos_ids),
        jnp.asarray(np.asarray(rope_deltas)[:, 0]),
        jnp.asarray(np.full((B,), T, np.int32)),
        jnp.asarray(np.zeros((B, T), np.int32)))
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    if return_latents:
        return tokens, lengths, np.asarray(latents)
    return tokens, lengths


def _assert_token_parity(hf_out, tokens, lengths):
    """HF pads with PAD after EOS; ours pads with EOS. Compare per row:
    the emitted tokens (incl. the EOS itself) must match exactly."""
    B = hf_out.shape[0]
    for r in range(B):
        hf_row = hf_out[r]
        hf_stop = np.where(hf_row == EOS)[0]
        hf_len = int(hf_stop[0]) + 1 if hf_stop.size else hf_row.shape[0]
        our_len = int(lengths[r])
        # our `lengths` = index of first EOS (or max_new if none)
        our_emitted = our_len + 1 if our_len < tokens.shape[1] else our_len
        assert hf_len == min(our_emitted, hf_row.shape[0]), (
            r, hf_len, our_len, hf_row.tolist(), tokens[r].tolist())
        np.testing.assert_array_equal(tokens[r][:hf_len], hf_row[:hf_len])


@pytest.mark.parametrize("n_images", [1, 4, 9])
def test_greedy_generate_matches_hf(hf_vlm, n_images):
    model, cfg, params = _our_model_and_params(hf_vlm)
    rs = np.random.RandomState(100 + n_images)
    ids = np.stack([_prompt_ids(rs, n_images), _prompt_ids(rs, n_images)])
    patches, grid, imgs = _pixel_inputs(rs, 2 * n_images)

    hf_out = _hf_generate(hf_vlm, ids, patches, grid)
    tokens, lengths = _ours_generate(model, cfg, params, ids, imgs)
    _assert_token_parity(hf_out, tokens, lengths)


def test_greedy_generate_eos_stop_matches_hf(hf_vlm):
    """Bias the EOS logit so greedy decoding stops early: the EOS step and
    every token before it must match HF's early-stopped generate."""
    hf = hf_vlm
    with torch.no_grad():
        hf.lm_head.weight[EOS] += 0.35
    try:
        model, cfg, params = _our_model_and_params(hf)
        rs = np.random.RandomState(7)
        ids = np.stack([_prompt_ids(rs, 4), _prompt_ids(rs, 4)])
        patches, grid, imgs = _pixel_inputs(rs, 8)
        hf_out = _hf_generate(hf, ids, patches, grid)
        tokens, lengths = _ours_generate(model, cfg, params, ids, imgs)
        # the bias must actually trigger an early stop for the test to
        # mean anything
        assert (hf_out == EOS).any(), hf_out
        _assert_token_parity(hf_out, tokens, lengths)
    finally:
        with torch.no_grad():
            hf.lm_head.weight[EOS] -= 0.35


def test_traj_latents_match_hf_full_prefill(hf_vlm):
    """Our chunked traj-latent decode over the generation's KV cache must
    equal an HF full prefill over [prompt, generated, traj queries] — the
    reference's generate_latents (internvla_n1.py:320-347)."""
    model, cfg, params = _our_model_and_params(hf_vlm)
    rs = np.random.RandomState(21)
    ids = _prompt_ids(rs, 4)[None]
    patches, grid, imgs = _pixel_inputs(rs, 4)

    tokens, lengths, latents = _ours_generate(
        model, cfg, params, ids, imgs, return_latents=True)
    gen = tokens[0][: int(lengths[0])]
    n_q = cfg.n_query

    hf = hf_vlm
    full = np.concatenate([ids[0], gen,
                           np.full((n_q,), TRAJ_TOK, np.int64)])[None]
    full_t = torch.tensor(full)
    with torch.no_grad():
        embeds = hf.model.get_input_embeddings()(
            torch.tensor(np.where(full >= VOCAB, 0, full)))
        vis = hf.model.visual(
            torch.tensor(np.asarray(patches), dtype=torch.float32),
            grid_thw=torch.tensor(np.asarray(grid)))
        img_pos = np.where(full[0] == IMG_TOK)[0]
        embeds[0, img_pos] = vis
        # scatter OUR learned latent queries, like the reference's
        # prepare_inputs_* traj-token path (internvla_n1.py:166-172)
        q = np.asarray(params["latent_queries"])[0]
        traj_pos = np.where(full[0] == TRAJ_TOK)[0]
        embeds[0, traj_pos] = torch.tensor(q, dtype=embeds.dtype)
        pos_ids, _ = hf.model.get_rope_index(
            full_t, torch.tensor(np.asarray(grid)),
            attention_mask=torch.ones_like(full_t))
        hidden = hf.model.language_model(
            inputs_embeds=embeds, position_ids=pos_ids,
        ).last_hidden_state
        hf_latents = hidden[:, -n_q:].numpy()

    np.testing.assert_allclose(np.asarray(latents[0]), hf_latents[0],
                               atol=3e-4, rtol=3e-3)


def test_get_rope_index_2_matches_hf_qwen2vl():
    """get_rope_index_2 (the Qwen2-VL variant, reference rope2d.py:183)
    against HF Qwen2VLModel.get_rope_index on mixed image+video prompts."""
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import Qwen2VLModel

    from internnav_tpu.ops.rope import get_rope_index_2

    cfg = Qwen2VLConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=IMG_TOK, video_token_id=TRAJ_TOK,
        vision_start_token_id=VS, vision_end_token_id=VE,
        vision_config={"depth": 1, "embed_dim": 32, "hidden_size": 64,
                       "num_heads": 4, "spatial_merge_size": 2},
    )
    hf = Qwen2VLModel(cfg)

    rs = np.random.RandomState(3)
    img_grid = np.asarray([[1, 4, 4], [1, 4, 4]])  # 4 merged tokens each
    vid_grid = np.asarray([[2, 4, 4]])  # 8 merged tokens
    ids = list(rs.randint(3, 490, size=4))
    ids += [VS] + [IMG_TOK] * 4 + [VE]
    ids += list(rs.randint(3, 490, size=3))
    ids += [VS] + [TRAJ_TOK] * 8 + [VE]  # video run
    ids += [VS] + [IMG_TOK] * 4 + [VE]
    ids += list(rs.randint(3, 490, size=5))
    ids = np.asarray(ids, np.int64)[None]

    import torch as t

    hf_pos, hf_delta = hf.get_rope_index(
        t.tensor(ids), t.tensor(img_grid), t.tensor(vid_grid),
        attention_mask=t.ones(ids.shape, dtype=t.long))
    pos, delta = get_rope_index_2(
        ids, img_grid, vid_grid, image_token_id=IMG_TOK,
        video_token_id=TRAJ_TOK, vision_start_token_id=VS)
    np.testing.assert_array_equal(pos, hf_pos.numpy())
    np.testing.assert_array_equal(delta, hf_delta.numpy())
