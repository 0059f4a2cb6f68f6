#!/bin/sh
# Round-5 on-chip adjudication sweep (VERDICT r4 #2/#4/#8).
#
# Phase A — int8 KV A-B at the round-4 headline geometry (3x16, shared
#           grouped decode, per-cohort S1), same session.
# Phase B — cohort-geometry re-sweep at both KV dtypes (2x24, 4x12; the
#           3x16 points come from phase A).
# The winner then gets a median-of-3 evaluator-path headline run, the
# --no-overlap A-B, and the low-latency pareto (driven separately).
#
# Every run appends one JSON line to logs/r05_sweep.jsonl.
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs
OUT=logs/r05_sweep.jsonl

run() {
    desc="$1"; shift
    echo "{\"sweep_desc\": \"$desc\", \"started\": \"$(date -u +%FT%TZ)\"}" >> "$OUT"
    timeout 3600 python bench.py "$@" >> "$OUT" 2>logs/r05_sweep_last_stderr.log \
        || echo "{\"sweep_desc\": \"$desc\", \"error\": \"rc=$?\"}" >> "$OUT"
}

# Phase A: kv dtype A-B at pinned 3x16
run "A1 3x16 kv=bf16" --batch 16 --cohorts 3 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype bf16
run "A2 3x16 kv=int8" --batch 16 --cohorts 3 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype int8

# Phase B: geometry at both kv dtypes
run "B1 2x24 kv=bf16" --batch 24 --cohorts 2 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype bf16
run "B2 2x24 kv=int8" --batch 24 --cohorts 2 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype int8
run "B3 4x12 kv=bf16" --batch 12 --cohorts 4 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype bf16
run "B4 4x12 kv=int8" --batch 12 --cohorts 4 --shared-decode --per-cohort-s1 \
    --pin-geometry --eval-runs 1 --kv-dtype int8

echo "SWEEP DONE $(date -u +%FT%TZ)" >> "$OUT"
