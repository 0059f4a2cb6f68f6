#!/bin/sh
# Round-5 chip phase 3: runs AFTER phase2_r05.sh (waits on its marker).
#
#   1. Gated-parity audit trail (VERDICT r4 #3): the on-TPU runs of the
#      Pallas attention + int8-KV test modules, captured verbatim to
#      docs/artifacts/parity_r05.txt. Must hold the chip EXCLUSIVELY —
#      a concurrent chip process aborts both (round-4 lesson).
#   2. Low-latency pareto sweep (VERDICT r4 #4): cohorts {1,2,3} x
#      batch {8,16} at the serving default kv dtype, one evaluator-path
#      sample each, appended to logs/r05_pareto.jsonl.
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs docs/artifacts

while [ ! -f logs/r05_phase2.done ]; do sleep 30; done

AUDIT=docs/artifacts/parity_r05.txt
{
    echo "# Gated-parity audit — round 5"
    echo "date: $(date -u +%FT%TZ)"
    echo "host: one TPU v5e chip via axon tunnel (exclusive)"
    echo "cmd: INTERNNAV_TPU_TESTS=1 pytest tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m ''"
} > "$AUDIT"
INTERNNAV_TPU_TESTS=1 timeout 5400 python -m pytest \
    tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m '' \
    >> "$AUDIT" 2>&1
echo "exit: $?" >> "$AUDIT"

OUT=logs/r05_pareto.jsonl
run() {
    desc="$1"; shift
    echo "{\"pareto_desc\": \"$desc\", \"started\": \"$(date -u +%FT%TZ)\"}" >> "$OUT"
    timeout 3600 python bench.py "$@" >> "$OUT" 2>logs/r05_pareto_last_stderr.log \
        || echo "{\"pareto_desc\": \"$desc\", \"error\": \"rc=$?\"}" >> "$OUT"
}

for C in 1 2 3; do
    for B in 8 16; do
        run "pareto ${C}x${B}" --batch "$B" --cohorts "$C" \
            --shared-decode --per-cohort-s1 --pin-geometry \
            --eval-runs 1 --kv-dtype int8
    done
done

echo "PHASE3 DONE $(date -u +%FT%TZ)" > logs/r05_phase3.done
