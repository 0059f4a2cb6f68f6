"""World-size-2 distributed-eval gather (evaluator/base.py
gather_results' process_allgather branch + rank-0 result write), run as
two real `jax.distributed` CPU processes via the dryrun script."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_two_process_eval_gather():
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/tools/dryrun_distributed_eval.py")],
        capture_output=True, text=True, timeout=600)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no summary line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    assert summary["ok"], summary
    assert out.returncode == 0
    assert summary["result_json"]["num_episodes"] == 6
    locals_ = summary["per_rank_local_episodes"]
    assert len(locals_) == 2 and not (set(locals_[0]) & set(locals_[1]))
