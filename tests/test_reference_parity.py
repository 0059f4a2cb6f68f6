"""Parity tests against the REFERENCE's own importable modules.

Every other parity test pins numerics against in-test torch replicas
(necessary where the reference module needs diffusers/gym/habitat, none of
which are installed). These tests eliminate replica-drift risk for the
modules that DO import cleanly from /root/reference today:

  internnav.model.basemodel.internvla_n1.internvla_n1_arch
      (MemoryEncoder, QFormer)
  internnav.model.utils.vln_utils
      (split_and_clean, chunk_token, traj_to_actions)
  internnav.dataset.rope2d
      (get_rope_index_25, get_rope_index_2)

Modules that still need replicas, and why (verified import failures):
  internvla_n1.py            -> needs diffusers
  cma/seq2seq/rdp policies   -> need gym
  instruction_encoder        -> needs transformers<4.5 (apply_chunking_to_forward)
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# APPEND (not insert): the reference repo has a regular `scripts`
# package whose __init__.py would otherwise shadow this repo's
# `scripts` package for every test that runs after this module
# (PEP 420: a regular package anywhere on sys.path beats namespace
# portions, and an earlier regular package beats a later one).
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_arch = pytest.importorskip(
    "internnav.model.basemodel.internvla_n1.internvla_n1_arch")
ref_vln_utils = pytest.importorskip("internnav.model.utils.vln_utils")
ref_rope2d = pytest.importorskip("internnav.dataset.rope2d")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sd(module):
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


def test_memory_encoder_parity_vs_reference_module():
    """Our Flax MemoryEncoder vs the REFERENCE's own torch MemoryEncoder
    (internvla_n1_arch.py:75-93), converted weights, eval mode."""
    from internnav_tpu.model.basemodel.internvla_n1.model import MemoryEncoder
    from internnav_tpu.model.weights.convert import convert_memory_encoder

    torch.manual_seed(0)
    ref = ref_arch.MemoryEncoder(hidden_size=384, num_heads=6,
                                 num_layers=3).eval()
    sd = {f"model.memory_encoder.{k}": v for k, v in _sd(ref).items()}
    params = convert_memory_encoder(sd)

    rs = np.random.RandomState(0)
    mem = rs.randn(2, 10, 384).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(mem)).numpy()
    ours = MemoryEncoder(hidden_size=384, num_heads=6, num_layers=3)
    got = ours.apply({"params": params}, jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_qformer_parity_vs_reference_module():
    """Our Flax QFormer vs the REFERENCE's own torch QFormer
    (internvla_n1_arch.py:96-118)."""
    from internnav_tpu.model.basemodel.internvla_n1.model import QFormer
    from internnav_tpu.model.weights.convert import convert_qformer

    torch.manual_seed(1)
    ref = ref_arch.QFormer(num_query=8, hidden_size=768, num_layers=3,
                           num_heads=12).eval()
    sd = {f"model.rgb_resampler.{k}": v for k, v in _sd(ref).items()}
    params = convert_qformer(sd)

    rs = np.random.RandomState(1)
    feats = rs.randn(2, 20, 768).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(feats)).numpy()
    ours = QFormer(num_query=8, hidden_size=768, num_layers=3, num_heads=12)
    got = ours.apply({"params": params}, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def _mixed_prompt(rs, image_token, video_token, vs_token):
    ids = list(rs.randint(3, 400, size=5))
    ids += [vs_token] + [image_token] * 4 + [vs_token + 1]
    ids += list(rs.randint(3, 400, size=3))
    ids += [vs_token] + [video_token] * 8 + [vs_token + 1]
    ids += [vs_token] + [image_token] * 4 + [vs_token + 1]
    ids += list(rs.randint(3, 400, size=6))
    return np.asarray(ids, np.int64)[None]


@pytest.mark.parametrize("variant", ["25", "2"])
def test_rope_index_parity_vs_reference_module(variant):
    """get_rope_index_25 / get_rope_index_2 vs the reference's own
    rope2d.py implementations on a mixed image+video prompt."""
    from internnav_tpu.ops.rope import get_rope_index_2, get_rope_index_25

    rs = np.random.RandomState(int(variant))
    IMG, VID, VSID = 151655, 151656, 151652
    ids = _mixed_prompt(rs, IMG, VID, VSID)
    img_grid = np.asarray([[1, 4, 4], [1, 4, 4]])
    vid_grid = np.asarray([[2, 4, 4]])

    if variant == "25":
        want_pos, want_delta = ref_rope2d.get_rope_index_25(
            2, torch.tensor(ids), torch.tensor(img_grid),
            torch.tensor(vid_grid),
            second_per_grid_ts=torch.tensor([0.5]))
        pos, delta = get_rope_index_25(
            ids, img_grid, vid_grid, spatial_merge_size=2,
            second_per_grid_ts=[0.5])
    else:
        want_pos, want_delta = ref_rope2d.get_rope_index_2(
            2, torch.tensor(ids), torch.tensor(img_grid),
            torch.tensor(vid_grid))
        pos, delta = get_rope_index_2(ids, img_grid, vid_grid,
                                      spatial_merge_size=2)
    np.testing.assert_array_equal(pos, want_pos.numpy())
    np.testing.assert_array_equal(np.asarray(delta).reshape(-1),
                                  want_delta.numpy().reshape(-1))


def test_vln_utils_parity_vs_reference_module():
    """split_and_clean / chunk_token / traj_to_actions vs the reference's
    own vln_utils on random trajectories."""
    from internnav_tpu.model.utils.vln_utils import (
        chunk_token,
        split_and_clean,
        traj_to_actions,
    )

    text = ("Go to the kitchen. These are your historical observations: "
            "<image>\n<image>\n. you can see <image>.")
    assert split_and_clean(text) == ref_vln_utils.split_and_clean(text)

    rs = np.random.RandomState(3)
    dp = rs.randn(6, 3).astype(np.float32) * 0.3
    dp[1] = [0.01, 0.0, 0.01]  # stop row
    want = ref_vln_utils.chunk_token(torch.tensor(dp))
    got = chunk_token(np.asarray(dp))
    assert list(got) == list(want)

    trajs = rs.randn(4, 8, 3).astype(np.float64) * 0.2
    # reference wants a torch tensor and mutates it in place -> pass copies
    want_actions = ref_vln_utils.traj_to_actions(torch.tensor(trajs))
    got_actions = traj_to_actions(trajs.copy())
    assert list(got_actions) == list(want_actions)
