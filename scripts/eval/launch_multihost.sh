#!/usr/bin/env bash
# Multi-host distributed evaluation launcher.
#
# Reference parity: scripts/eval/bash/eval_dual_system.sh (8-rank srun) and
# eval_vln_distributed.sh. On TPU pods each host process runs the same
# command; jax.distributed picks up rank/coordinator from the TPU runtime
# (or set JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES for
# CPU/GPU clusters). Episodes shard rank::world_size automatically
# (internnav_tpu.env.episodes.shard_episodes) and metrics gather via
# multihost_utils (Evaluator.gather_results).
#
# Usage: ./launch_multihost.sh <config.py> [extra args...]
set -euo pipefail
CONFIG=${1:?usage: launch_multihost.sh <eval_config.py>}
shift || true
python - "$CONFIG" "$@" <<'PY'
import sys
import jax

try:
    jax.distributed.initialize()  # no-op / env-driven on single host
except Exception as e:
    print(f"jax.distributed not initialized ({e}); running single-process")
sys.argv = ["eval.py", "--config", sys.argv[1], *sys.argv[2:]]
exec(open("scripts/eval/eval.py").read())
PY
