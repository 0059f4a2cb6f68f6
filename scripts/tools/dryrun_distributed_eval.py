"""Two-process distributed-evaluation dryrun (world_size=2 on CPU).

Exercises the one SURVEY §2.9 mechanism a single-process test cannot:
the multi-PROCESS metric gather in Evaluator.gather_results
(internnav_tpu/evaluator/base.py — process_allgather of json payloads
when jax.process_count() > 1) and the rank-0-only result.json write,
against a sharded FakeEnv evaluation. Reference counterpart:
internnav/evaluator/distributed_base.py:70-149 (per-rank eval_action →
gather → calc_metrics → rank-0 result append).

Run with no args: spawns two `jax.distributed` CPU worker processes
(gloo collectives, coordinator on localhost), waits, validates:
  * each rank evaluated only its shard (3 of 6 episodes in its store),
  * BOTH ranks' gathered metrics cover the full 6-episode union,
  * exactly rank 0 wrote result.json, with num_episodes == 6,
then prints ONE JSON summary line and exits 0. Any failure exits 1.

CI: invoked directly as a workflow step (see .github/workflows).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
N_EPISODES = 6
WORLD = 2


def _episodes():
    import numpy as np

    from internnav_tpu.env.episodes import Episode

    eps = []
    for i in range(N_EPISODES):
        ref = np.stack([np.linspace(0, 1 + i, 4), np.zeros(4), np.zeros(4)], 1)
        eps.append(Episode(
            episode_id=str(i), trajectory_id=f"t{i}", scene_id=f"s{i % 2}",
            instruction_text=f"walk forward {i}",
            instruction_tokens=np.asarray([2, 3, 4 + i], np.int32),
            start_position=np.zeros(3),
            start_rotation=np.asarray([1.0, 0, 0, 0]),
            reference_path=ref, geodesic_distance=float(1 + i)))
    return eps


def worker(rank: int, port: int, out_dir: str) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=WORLD, process_id=rank)
    assert jax.process_count() == WORLD, jax.process_count()

    from internnav_tpu.configs import (
        AgentCfg, EnvCfg, EvalCfg, EvalDatasetCfg, TaskCfg,
    )
    from internnav_tpu.evaluator import Evaluator

    cfg = EvalCfg(
        agent=AgentCfg(model_name="simple",
                       model_settings={"mode": "fixed", "action": 1}),
        env=EnvCfg(env_type="fake", env_num=2,
                   env_settings={"rgb_resolution": [32, 32],
                                 "depth_resolution": [32, 32]}),
        task=TaskCfg(max_step=4),
        dataset=EvalDatasetCfg(),
        eval_type="vln_batched",
        output_dir=out_dir,
    )
    ev = Evaluator.init(cfg, episodes=_episodes())
    assert ev.world_size == WORLD, ev.world_size
    metrics = ev.eval()  # the product path: eval_action → gather → rank-0 write

    local_keys = sorted(str((rec.get("info") or {}).get("episode_id"))
                        for rec in ev.store.records())
    with open(f"{out_dir}/rank{rank}.json", "w") as f:
        json.dump({"rank": rank, "world": ev.world_size,
                   "gathered_num_episodes": metrics["num_episodes"],
                   "local_episode_ids": local_keys}, f)


def launch() -> int:
    out_dir = tempfile.mkdtemp(prefix="disteval_")
    port = 9480 + os.getpid() % 500
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}  # keep the axon TPU plugin out
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--rank", str(r), "--port", str(port),
         "--out", out_dir], env=env) for r in range(WORLD)]
    codes = [p.wait(timeout=600) for p in procs]

    summary = {"ok": True, "world": WORLD, "episodes": N_EPISODES,
               "out_dir": out_dir, "worker_exit_codes": codes}
    try:
        assert codes == [0, 0], codes
        ranks = []
        for r in range(WORLD):
            with open(f"{out_dir}/rank{r}.json") as f:
                ranks.append(json.load(f))
        # each rank ran only its shard...
        locals_ = [set(r["local_episode_ids"]) for r in ranks]
        assert all(0 < len(s) < N_EPISODES for s in locals_), locals_
        assert not (locals_[0] & locals_[1]), locals_
        assert locals_[0] | locals_[1] == {str(i) for i in
                                           range(N_EPISODES)}, locals_
        # ...but BOTH ranks' gathered metrics cover the union
        assert all(r["gathered_num_episodes"] == N_EPISODES
                   for r in ranks), ranks
        # rank 0 wrote exactly one result.json line for the run
        with open(f"{out_dir}/result.json") as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        assert len(lines) == 1 and lines[0]["num_episodes"] == N_EPISODES
        summary["result_json"] = lines[0]
        summary["per_rank_local_episodes"] = [sorted(s) for s in locals_]
    except AssertionError as e:
        summary["ok"] = False
        summary["error"] = str(e)[:500]
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--port", type=int, default=9480)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
    if args.rank is None:
        raise SystemExit(launch())
    sys.path.insert(0, str(REPO))
    worker(args.rank, args.port, args.out)


if __name__ == "__main__":
    main()
