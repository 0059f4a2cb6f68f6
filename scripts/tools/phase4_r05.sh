#!/bin/sh
# Round-5 chip phase 4 (quiet-window headline runs): after phase3.
#
# The adjudication sweep picked 4 cohorts x 12 streams; single evaluator
# samples are too noisy to pick the KV dtype or judge the overlap
# scheduler, so this phase runs the full factorization at median-of-3
# resolution: {int8, bf16 KV} x {overlap on, off}. The best
# overlap-on median is THE round-5 headline; the overlap A-B and the
# kv A-B read straight off the table.
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs

while [ ! -f logs/r05_phase3.done ]; do sleep 30; done

OUT=logs/r05_headline.jsonl
run() {
    desc="$1"; shift
    echo "{\"headline_desc\": \"$desc\", \"started\": \"$(date -u +%FT%TZ)\"}" >> "$OUT"
    timeout 3600 python bench.py "$@" >> "$OUT" 2>logs/r05_headline_last_stderr.log \
        || echo "{\"headline_desc\": \"$desc\", \"error\": \"rc=$?\"}" >> "$OUT"
}

run "H1 4x12 kv=int8 overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype int8
run "H2 4x12 kv=bf16 overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype bf16
run "H3 4x12 kv=int8 no-overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype int8 --no-overlap
run "H4 4x12 kv=bf16 no-overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype bf16 --no-overlap

echo "PHASE4 DONE $(date -u +%FT%TZ)" > logs/r05_phase4.done
