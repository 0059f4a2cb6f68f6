"""DepthAnythingV2 DPT head parity vs the reference's own vendored module.

Loads /root/reference/.../depth_anything_v2 directly (synthetic package so
the broken internnav.model.encoder.__init__ import chain is bypassed;
torchvision stubbed — dpt.py only uses transforms.Compose, and only inside
image2tensor which this test does not call).
"""

import importlib
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

DAV2_DIR = ("/root/reference/internnav/model/encoder/depth_anything/"
            "depth_anything_v2")


def _load_reference_dav2():
    pytest.importorskip("torch")
    added_stub = "torchvision" not in sys.modules
    if added_stub:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        def _compose(fns):
            def run(x):
                for f in fns:
                    x = f(x)
                return x
            return run

        tr.Compose = _compose
        tv.transforms = tr
        # a bare ModuleType has __spec__ None, which makes any LATER
        # importlib.util.find_spec("torchvision") raise ValueError —
        # transformers probes exactly that at import, so give the stub a
        # real spec and drop it again right after the reference import
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tr.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    try:
        if "ref_dav2" not in sys.modules:
            pkg = types.ModuleType("ref_dav2")
            pkg.__path__ = [DAV2_DIR]
            sys.modules["ref_dav2"] = pkg
        return importlib.import_module("ref_dav2.dpt")
    finally:
        if added_stub:  # leave no trace for unrelated tests
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.transforms", None)


@pytest.mark.slow
def test_depth_anything_v2_full_parity():
    """Random-init reference DepthAnythingV2 (vits metric config,
    dpt.py:152-185) -> convert -> flax forward matches torch end to end,
    including the DPT fusion pyramid, align_corners resizes, and the
    conversion-time pos-embed bicubic (dinov2.py:180-211)."""
    import torch

    dpt_mod = _load_reference_dav2()
    torch.manual_seed(0)
    ref = dpt_mod.DepthAnythingV2(encoder="vits", features=64,
                                  out_channels=[48, 96, 192, 384])
    ref.eval()

    H = W = 70  # 5x5 patch grid: pos embed must interpolate from 37x37
    x = torch.randn(2, 3, H, W)
    with torch.no_grad():
        want = ref(x).numpy()  # (2, 70, 70)

    from internnav_tpu.model.encoder.dpt import DepthAnythingV2
    from internnav_tpu.model.weights.convert import convert_depth_anything_v2

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_depth_anything_v2(sd, grid_hw=(H // 14, W // 14))
    model = DepthAnythingV2(max_depth=ref.max_depth)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape
    denom = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got, want, atol=3e-3 * denom, rtol=0,
                               err_msg="DPT depth parity failed")


@pytest.mark.slow
def test_resize_bilinear_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from internnav_tpu.model.encoder.dpt import resize_bilinear_align_corners

    rs = np.random.RandomState(0)
    x = rs.randn(2, 7, 9, 3).astype(np.float32)
    for out_hw in ((14, 18), (5, 5), (13, 4)):
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             size=out_hw, mode="bilinear",
                             align_corners=True).numpy()
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   atol=1e-5, rtol=1e-5)
