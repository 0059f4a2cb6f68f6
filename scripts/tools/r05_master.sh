#!/bin/sh
# Round-5 master chip program (restart). The original phase2-6 queue ran
# on 2026-08-19 but the machine was reset before its logs/ results were
# committed; the committed parity_r05.txt captured only the 20:28Z run
# against a chip wedged by the (since-fixed) bench_train OOM. This
# script re-runs everything that still matters, highest priority first,
# one chip process at a time, and leaves every result under logs/ for
# the session to commit into docs/.
#
#   P1 headline factorization (VERDICT r4 #2/#8): 4x12 geometry,
#      {int8,bf16 KV} x {overlap,no-overlap}, median-of-3 evaluator runs.
#   P2 gated-parity audit on a healthy chip (VERDICT r4 #3).
#   P3 bench.py --train with the bf16-Adam-moment fix (VERDICT r4 #7).
#   P4 low-latency pareto sweep (VERDICT r4 #4).
#   P5 compare-quant-sequential kv=int8 + kv=bf16 companion (VERDICT r4 #5).
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs docs/artifacts

HEAD=logs/r05_headline.jsonl
run_headline() {
    desc="$1"; shift
    echo "{\"headline_desc\": \"$desc\", \"started\": \"$(date -u +%FT%TZ)\"}" >> "$HEAD"
    timeout 3600 python bench.py "$@" >> "$HEAD" 2>logs/r05_headline_last_stderr.log \
        || echo "{\"headline_desc\": \"$desc\", \"error\": \"rc=$?\"}" >> "$HEAD"
}

run_headline "H1 4x12 kv=int8 overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype int8
run_headline "H2 4x12 kv=bf16 overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype bf16
run_headline "H3 4x12 kv=int8 no-overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype int8 --no-overlap
run_headline "H4 4x12 kv=bf16 no-overlap" --batch 12 --cohorts 4 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 3 --kv-dtype bf16 --no-overlap
echo "HEADLINE DONE $(date -u +%FT%TZ)" > logs/r05_headline.done

AUDIT=logs/parity_r05.txt
{
    echo "# Gated-parity audit — round 5"
    echo "date: $(date -u +%FT%TZ)"
    echo "host: one TPU v5e chip via axon tunnel (exclusive)"
    echo "cmd: INTERNNAV_TPU_TESTS=1 pytest tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m ''"
    echo "note: re-run; the committed 2026-08-19T20:28Z attempt aborted"
    echo "      wholesale against a chip wedged by a bench_train"
    echo "      RESOURCE_EXHAUSTED (since fixed: bf16 Adam moments)."
} > "$AUDIT"
INTERNNAV_TPU_TESTS=1 timeout 5400 python -m pytest \
    tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m '' \
    >> "$AUDIT" 2>&1
echo "exit: $?" >> "$AUDIT"
echo "PARITY DONE $(date -u +%FT%TZ)" > logs/r05_parity.done

timeout 2400 python bench.py --train > logs/r05_train.json 2> logs/r05_train.err \
    || echo "{\"train_error\": \"rc=$?\"}" >> logs/r05_train.json
echo "TRAIN DONE $(date -u +%FT%TZ)" > logs/r05_train.done

PAR=logs/r05_pareto.jsonl
run_pareto() {
    desc="$1"; shift
    echo "{\"pareto_desc\": \"$desc\", \"started\": \"$(date -u +%FT%TZ)\"}" >> "$PAR"
    timeout 3600 python bench.py "$@" >> "$PAR" 2>logs/r05_pareto_last_stderr.log \
        || echo "{\"pareto_desc\": \"$desc\", \"error\": \"rc=$?\"}" >> "$PAR"
}
for C in 1 2 3; do
    for B in 8 16; do
        run_pareto "pareto ${C}x${B}" --batch "$B" --cohorts "$C" \
            --shared-decode --per-cohort-s1 --pin-geometry \
            --eval-runs 1 --kv-dtype int8
    done
done
run_pareto "pareto 1x4" --batch 4 --cohorts 1 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 1 --kv-dtype int8
echo "PARETO DONE $(date -u +%FT%TZ)" > logs/r05_pareto.done

timeout 3600 python bench.py --compare-quant-sequential --quant-layers 20 \
    --kv-dtype int8 > logs/r05_quant_kv8.json 2> logs/r05_quant_kv8.err \
    || echo "{\"quant_error\": \"rc=$?\"}" >> logs/r05_quant_kv8.json
timeout 3600 python bench.py --compare-quant-sequential --quant-layers 20 \
    --kv-dtype bf16 > logs/r05_quant_kvbf16.json 2> logs/r05_quant_kvbf16.err \
    || echo "{\"quant_error\": \"rc=$?\"}" >> logs/r05_quant_kvbf16.json
echo "QUANT DONE $(date -u +%FT%TZ)" > logs/r05_quant.done

echo "MASTER DONE $(date -u +%FT%TZ)" > logs/r05_master.done
