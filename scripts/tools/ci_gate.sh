#!/bin/sh
# Full local CI gate — the same three jobs .github/workflows/ci.yml would
# run on a GitHub runner, runnable here (no remote exists in this
# environment, so the workflow file alone gates nothing; see
# .githooks/pre-commit for the per-commit gate).
#
# Usage: sh scripts/tools/ci_gate.sh   (~15 min on one CPU core)
set -e
cd "$(git rev-parse --show-toplevel)"

echo "== fast tier =="
# PALLAS_AXON_POOL_IPS= here too: sitecustomize's register() runs at
# interpreter START (before conftest can set JAX_PLATFORMS=cpu), attaching
# even CPU-only test processes to the axon tunnel — which starves any
# concurrent chip measurement (the round-5 parity-audit aborts).
PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

echo "== multichip dryrun (8 virtual devices) =="
# PALLAS_AXON_POOL_IPS= : keep the axon TPU plugin out — sitecustomize's
# register() overrides JAX_PLATFORMS and would attach this process to the
# (possibly busy) chip
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== distributed-eval dryrun (2 jax.distributed processes) =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/tools/dryrun_distributed_eval.py

echo "CI GATE GREEN"
