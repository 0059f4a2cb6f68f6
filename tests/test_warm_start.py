"""Warm-start checkpoint routing (reference base_train/train.py:127:
`from_pretrained(il.ckpt_to_load)` — the cma_plus/seq2seq_plus recipe).

Covers: torch-vs-native checkpoint auto-detection, the converter routing
in Policy.load_params_file, tolerant load_config fallback on non-native
config.json, and the train config files' schema."""

import glob
import json
import os

import numpy as np
import pytest

from internnav_tpu.configs import load_py_config
from internnav_tpu.model.base import CONFIG_NAME, WEIGHTS_NAME, Policy


def test_train_config_files_load_and_validate():
    """Every scripts/train/configs/*_cfg.py exposes a valid ExpCfg; the
    plus/challenge variants carry a warm-start ckpt_to_load."""
    paths = sorted(glob.glob("scripts/train/configs/*_cfg.py"))
    assert len(paths) >= 8
    warm = 0
    for p in paths:
        cfg = load_py_config(p, attr="exp_cfg")
        assert cfg.model_name in ("cma", "seq2seq", "rdp", "navdp")
        assert cfg.il.epochs > 0 and cfg.il.lr > 0
        if cfg.il.ckpt_to_load:
            warm += 1
            assert cfg.il.load_from_ckpt
    assert warm >= 4  # cma_plus, seq2seq_plus, 2x challenge


def test_is_torch_checkpoint_detection(tmp_path):
    # bare files by extension
    for ext in (".pth", ".pt", ".bin", ".safetensors"):
        f = tmp_path / f"w{ext}"
        f.write_bytes(b"x")
        assert Policy._is_torch_checkpoint(str(f))
    f = tmp_path / "params.msgpack"
    f.write_bytes(b"x")
    assert not Policy._is_torch_checkpoint(str(f))
    # dir with only torch weights -> torch
    d1 = tmp_path / "torch_dir"
    d1.mkdir()
    (d1 / "model.pth").write_bytes(b"x")
    assert Policy._is_torch_checkpoint(str(d1))
    # dir with the native msgpack wins even when torch files coexist
    d2 = tmp_path / "native_dir"
    d2.mkdir()
    (d2 / WEIGHTS_NAME).write_bytes(b"x")
    (d2 / "model.pth").write_bytes(b"x")
    assert not Policy._is_torch_checkpoint(str(d2))


def test_load_params_file_routes_torch_through_converter(tmp_path, monkeypatch):
    """A torch checkpoint dir goes through TORCH_CONVERTER_NAME and the
    tolerant merge; matching leaves load, mismatched keep init."""
    torch = pytest.importorskip("torch")
    from internnav_tpu.model.weights import convert as convert_mod

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    torch.save({"w": torch.full((3, 2), 2.0)}, ckpt / "model.pth")

    def fake_converter(sd):
        assert set(sd) == {"w"}
        return {"a": sd["w"], "extra": np.ones((5,), np.float32)}

    monkeypatch.setattr(convert_mod, "convert_cma_policy", fake_converter,
                        raising=True)

    class P(Policy):
        TORCH_CONVERTER_NAME = "convert_cma_policy"

    init = {"a": np.zeros((3, 2), np.float32),
            "b": np.zeros((4,), np.float32)}
    merged = P.load_params_file(str(ckpt), init)
    np.testing.assert_array_equal(np.asarray(merged["a"]), 2.0 * np.ones((3, 2)))
    np.testing.assert_array_equal(np.asarray(merged["b"]), np.zeros((4,)))
    assert "extra" not in merged  # unexpected key dropped with a warning


def test_load_config_falls_back_on_foreign_config_json(tmp_path):
    """An HF/reference-style config.json next to a torch checkpoint is not
    our ModelCfg schema — load_config must fall back to the provided
    default instead of raising (tolerant-loading semantics). Because
    ModelCfg is all-defaulted with extra='allow', ANY dict would
    "validate": load_config requires the file to share ModelCfg's own
    keys before trusting it, so a dict-shaped HF config (the realistic
    case) also falls back rather than silently becoming a
    defaults-populated ModelCfg."""
    from internnav_tpu.configs.model import ModelCfg

    d = tmp_path / "hf_ckpt"
    d.mkdir()
    # realistic HF-style config: a dict with zero ModelCfg keys
    (d / CONFIG_NAME).write_text(json.dumps({
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "hidden_size": 3584, "num_hidden_layers": 28,
        "model_type": "qwen2_5_vl", "torch_dtype": "bfloat16",
    }))
    default = ModelCfg()
    assert Policy.load_config(str(d), default=default) is default
    with pytest.raises(Exception):
        Policy.load_config(str(d))

    # a native save_pretrained config (full model_dump) still validates
    d2 = tmp_path / "native_ckpt"
    d2.mkdir()
    native = ModelCfg(num_actions=7)
    (d2 / CONFIG_NAME).write_text(json.dumps(native.model_dump(),
                                             default=str))
    loaded = Policy.load_config(str(d2))
    assert loaded.num_actions == 7


def test_policies_declare_their_converters():
    from internnav_tpu.model.basemodel.cma import CMAPolicy
    from internnav_tpu.model.basemodel.navdp import NavDPPolicy
    from internnav_tpu.model.basemodel.rdp import RDPPolicy
    from internnav_tpu.model.basemodel.seq2seq import Seq2SeqPolicy
    from internnav_tpu.model.weights import convert as convert_mod

    for pol, name in ((CMAPolicy, "convert_cma_policy"),
                      (Seq2SeqPolicy, "convert_seq2seq_policy"),
                      (RDPPolicy, "convert_rdp_policy"),
                      (NavDPPolicy, "convert_navdp_policy")):
        assert pol.TORCH_CONVERTER_NAME == name
        assert callable(getattr(convert_mod, name))
