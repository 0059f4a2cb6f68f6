"""Smoke test for bench.py's pipelined auto mode (the exact code path the
driver runs as `python bench.py` at round end): candidate-config sweep
(shared grouped decode + per-cohort fused decode across neighboring cohort
counts), best-config selection, and the JSON schema — at tiny dims on CPU
so a bench.py regression never surfaces for the first time on the real
chip."""

import json
import sys
from pathlib import Path

import numpy as np

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench as bench_mod  # noqa: E402


def _tiny_cfg(num_layers, weight_dtype="bf16", quant_group_size=None,
              decode_act_dtype=None, kv_dtype="bf16"):
    """Tiny config that HONORS the dtype knobs, so the smoke exercises the
    exact weight_dtype/kv_dtype plumb-through the chip sweeps rely on."""
    import dataclasses

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )

    cfg = InternVLAN1Config.tiny("nextdit_async")
    tc = dataclasses.replace(cfg.text, weight_dtype=weight_dtype,
                             quant_group_size=quant_group_size,
                             kv_dtype=kv_dtype)
    if decode_act_dtype is not None:
        tc = dataclasses.replace(tc, decode_act_dtype=decode_act_dtype)
    return dataclasses.replace(cfg, text=tc)


@pytest.mark.parametrize("pinned", [None, False])
def test_bench_pipelined_candidate_sweep(monkeypatch, pinned):
    monkeypatch.setattr(bench_mod, "_full_n1_config", _tiny_cfg)
    monkeypatch.setattr(bench_mod, "IMAGE_HW", 56)
    monkeypatch.setattr(bench_mod, "DECODE_TOKENS", 4)
    monkeypatch.setattr(bench_mod, "CYCLES", 1)
    monkeypatch.setattr(bench_mod, "NUM_SAMPLE_TRAJS", 4)

    res = bench_mod.bench_pipelined(batch=2, cohorts=2, shared_decode=pinned,
                                    shared_s1=pinned)

    assert res["unit"] == "actions/s"
    assert res["value"] > 0
    det = res["detail"]
    tried = det["configs_measured"]
    if pinned is None:
        # auto mode: fully-grouped at both cohort counts, plus the
        # grouped-decode-only and fully-per-cohort fallbacks
        assert {(c["cohorts"], c["shared_decode"], c["shared_s1"])
                for c in tried} == {
            (2, True, True), (3, True, True), (2, True, False),
            (2, False, False)}
    else:
        assert all(c["shared_decode"] is False and c["shared_s1"] is False
                   for c in tried)
        assert {c["cohorts"] for c in tried} == {2, 3}
    assert all("actions_per_sec" in c or "error" in c for c in tried)
    # the reported headline is the best measured candidate
    best = max(c["actions_per_sec"] for c in tried if "actions_per_sec" in c)
    assert res["value"] == best
    assert det["shared_decode"] in (True, False)
    assert det["shared_s1"] in (True, False)
    assert det["phase_breakdown"]["s2_blocking_s"] > 0


def test_bench_pinned_geometry_kv_int8(monkeypatch):
    """--pin-geometry --kv-dtype int8 (the sweep/pareto mode): exactly the
    requested (cohorts, decode-mode, S1-mode) cell is measured — no
    alt-cohort candidate — and the int8 KV cache reaches the model config.
    These paths first ran on the real chip in round 5; this smoke keeps
    any regression from surfacing there again."""
    monkeypatch.setattr(bench_mod, "_full_n1_config", _tiny_cfg)
    monkeypatch.setattr(bench_mod, "IMAGE_HW", 56)
    monkeypatch.setattr(bench_mod, "DECODE_TOKENS", 4)
    monkeypatch.setattr(bench_mod, "CYCLES", 1)
    monkeypatch.setattr(bench_mod, "NUM_SAMPLE_TRAJS", 4)

    res = bench_mod.bench_pipelined(batch=2, cohorts=2, shared_decode=True,
                                    shared_s1=False, kv_dtype="int8",
                                    pin_geometry=True)
    det = res["detail"]
    assert det["kv_dtype"] == "int8"
    tried = det["configs_measured"]
    assert [(c["cohorts"], c["shared_decode"], c["shared_s1"])
            for c in tried] == [(2, True, False)]
    assert res["value"] == tried[0]["actions_per_sec"]
    # the kv dtype must actually reach the serving model config
    assert res.pop("_ctx")["inner"].cfg.text.kv_dtype == "int8"


def test_bench_median():
    """The headline median: true median for odd AND even sample counts
    (even N averages the middle two rather than reporting the optimistic
    upper-middle sample)."""
    assert bench_mod._median([1.0, 2.0, 9.0]) == 2.0
    assert bench_mod._median([4.2, 4.9]) == pytest.approx(4.55)
    assert bench_mod._median([1.0, 2.0, 3.0, 10.0]) == 2.5
    assert bench_mod._median([7.0]) == 7.0


def test_bench_evaluator_path_smoke(monkeypatch):
    """detail.evaluator_path: the full product loop (VLNPipelinedEvaluator
    over FakeEnv cohorts) on the serving bench's ctx, tiny dims on CPU."""
    monkeypatch.setattr(bench_mod, "_full_n1_config", _tiny_cfg)
    monkeypatch.setattr(bench_mod, "IMAGE_HW", 56)
    monkeypatch.setattr(bench_mod, "DECODE_TOKENS", 4)
    monkeypatch.setattr(bench_mod, "CYCLES", 1)
    monkeypatch.setattr(bench_mod, "NUM_SAMPLE_TRAJS", 4)

    res = bench_mod.bench_pipelined(batch=2, cohorts=2, shared_decode=False,
                                    shared_s1=False)
    ctx = res.pop("_ctx")
    assert abs(ctx["serving_aps"] - res["value"]) < 0.01
    ep = bench_mod.bench_evaluator_path(ctx, max_step=6)
    assert ep["actions_per_sec"] > 0
    assert ep["actions_timed"] > 0
    assert ep["action_latency_p50_ms"] > 0
    assert ep["action_latency_p99_ms"] >= ep["action_latency_p50_ms"]
    assert ep["vs_serving_loop"] > 0
    assert ep["episodes"] == ctx["batch"] * ctx["cohorts"]


def test_bench_compare_quant_sequential_smoke(monkeypatch):
    """Sequential (non-co-resident) quant-quality path at tiny dims:
    bf16 pass -> free -> deterministic regeneration -> in-place
    quantization (free_source) -> quant pass. The regenerated tree must
    be identical, so waypoint/latent deltas stay tiny and the schema is
    the same as the co-resident compare."""
    import dataclasses

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )

    def tiny_quant_cfg(num_layers, weight_dtype="bf16",
                       quant_group_size=None, decode_act_dtype=None,
                       kv_dtype="bf16"):
        cfg = InternVLAN1Config.tiny("nextdit_async")
        tc = dataclasses.replace(cfg.text, weight_dtype=weight_dtype,
                                 quant_group_size=quant_group_size,
                                 kv_dtype=kv_dtype)
        return dataclasses.replace(cfg, text=tc)

    monkeypatch.setattr(bench_mod, "_full_n1_config", tiny_quant_cfg)
    monkeypatch.setattr(bench_mod, "IMAGE_HW", 56)
    monkeypatch.setattr(bench_mod, "DECODE_TOKENS", 4)
    monkeypatch.setattr(bench_mod, "NUM_SAMPLE_TRAJS", 4)

    res = bench_mod.bench_compare_quant_sequential(num_layers=2, n_prompts=2)
    det = res["detail"]
    assert res["unit"] == "greedy_token_agreement"
    assert 0.0 <= res["value"] <= 1.0
    assert det["waypoint_mean_l2_m"] >= 0
    assert det["traj_latent_rel_l2"] < 1.0  # same source weights
    assert "sequential" in det["scheme"]

    # co-resident compare on the same tiny dims: schemas must line up so
    # the depth-sweep table can mix both
    res2 = bench_mod.bench_compare_quant(num_layers=2, n_prompts=2)
    assert res2["detail"]["kv_dtype"] == "bf16"
    assert set(res2["detail"]) - {"caveat", "scheme"} \
        == set(det) - {"caveat", "scheme"}


def test_bench_train_smoke(monkeypatch):
    """bench.py --train path at tiny dims on CPU: dataset -> packing ->
    prepare_batch -> jitted adamw step, with remat + chunked CE enabled
    exactly as the chip run uses them; JSON schema checked."""
    import dataclasses

    from internnav_tpu.model.basemodel.internvla_n1.model import (
        InternVLAN1Config,
    )

    def tiny_train_cfg(cls, system1="nextdit_async", weight_dtype="bf16",
                       kv_dtype="bf16", remat=False, num_hidden_layers=None):
        cfg = InternVLAN1Config.tiny(system1)
        return dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, remat=remat))

    monkeypatch.setattr(InternVLAN1Config, "qwen25vl_7b",
                        classmethod(tiny_train_cfg))
    res = bench_mod.bench_train(max_len=256, layers=2, reps=1,
                                image_hw=28, ce_chunk=64)
    assert res["unit"] == "tokens/s" and res["value"] > 0
    det = res["detail"]
    assert det["remat"] is True
    assert det["ce_chunk"] == 64
    assert np.isfinite(det["lm_loss"]) and np.isfinite(det["s1_loss"])
    assert det["step_time_s_median"] > 0
    # MFU accounting (param matmuls + packed-segment attention scores)
    assert det["mfu"] > 0 and np.isfinite(det["mfu"])
    assert "attention" in det["mfu_accounting"]
    json.dumps(res)  # one-line JSON serializable
