"""Realworld serving profiles + agent kv_dtype plumbing (VERDICT r4 #4).

The realworld HTTP launcher nominates a measured low-latency operating
point (`--profile realtime`): W8A8 decoder projections + int8 KV cache.
These tests pin (a) the profile table's contents, and (b) that the agent
builder actually threads ``model_settings['kv_dtype']`` into the flagship
config (reference has no equivalent; the torch server at
scripts/realworld/http_internvla_server.py:19- always loads bf16).
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import internnav_tpu.agent.internvla_n1_agent as agent_mod
from internnav_tpu.configs import AgentCfg


def _load_launcher():
    path = (Path(__file__).resolve().parents[1]
            / "scripts" / "realworld" / "http_internvla_server.py")
    spec = importlib.util.spec_from_file_location("rw_launcher", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_profiles_table():
    mod = _load_launcher()
    assert set(mod.PROFILES) == {"realtime", "parity"}
    assert mod.PROFILES["realtime"] == {"weight_dtype": "int8",
                                        "kv_dtype": "int8"}
    assert mod.PROFILES["parity"] == {"weight_dtype": "bf16",
                                      "kv_dtype": "bf16"}


def test_agent_builder_threads_kv_dtype(tmp_path, monkeypatch):
    """_build_n1_policy passes settings['kv_dtype'] into qwen25vl_7b when
    loading a native checkpoint (the realworld/realtime path)."""
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "params.msgpack").write_bytes(b"")
    (ckpt / "config.json").write_text(json.dumps({"weight_dtype": "int8"}))

    captured = {}

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )
    from internnav_tpu.model.basemodel.internvla_n1.policy import (
        InternVLAN1Policy,
    )

    real_cfg = InternVLAN1Config.tiny("nextdit_async")

    def fake_7b(system1, weight_dtype="bf16", kv_dtype="bf16", **kw):
        captured.update(system1=system1, weight_dtype=weight_dtype,
                        kv_dtype=kv_dtype)
        return real_cfg

    monkeypatch.setattr(InternVLAN1Config, "qwen25vl_7b",
                        staticmethod(fake_7b))
    monkeypatch.setattr(InternVLAN1Policy, "from_pretrained",
                        classmethod(lambda cls, path, cfg: ("policy", cfg)))

    cfg = AgentCfg(model_name="internvla_n1", ckpt_path=str(ckpt),
                   model_settings={"kv_dtype": "int8"})
    policy = agent_mod._build_n1_policy(cfg, cfg.model_settings)
    assert policy == ("policy", real_cfg)
    assert captured == {"system1": "nextdit_async",
                        "weight_dtype": "int8", "kv_dtype": "int8"}
