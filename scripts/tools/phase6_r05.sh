#!/bin/sh
# Round-5 chip phase 6: runs AFTER phase5_r05.sh (waits on its marker).
#
# Companion leg for the VERDICT r4 #5 quality table: the phase-2 run
# measured W8A8 + int8 KV sequentially at depth 20 (logs/r05_quant_kv8.json);
# this run is the SAME scheme with the KV cache left bf16, so the int8-KV
# column reads against an apples-to-apples W8A8 baseline (same depth, same
# prompts, same deterministic weight regeneration, same S1 rng).
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs

while [ ! -f logs/r05_phase5.done ]; do sleep 30; done

timeout 3600 python bench.py --compare-quant-sequential --quant-layers 20 \
    --kv-dtype bf16 \
    > logs/r05_quant_kvbf16.json 2> logs/r05_quant_kvbf16.err \
    || echo "{\"quant_error\": \"rc=$?\"}" >> logs/r05_quant_kvbf16.json

# extra pareto cell for the realtime operating point: the phase-3 sweep's
# lowest tail was 1 cohort x 8 streams (p99 877 ms); a single 4-stream
# cohort is the next rung down the latency curve
echo "{\"pareto_desc\": \"pareto 1x4\", \"started\": \"$(date -u +%FT%TZ)\"}" >> logs/r05_pareto.jsonl
timeout 3600 python bench.py --batch 4 --cohorts 1 --shared-decode \
    --per-cohort-s1 --pin-geometry --eval-runs 1 --kv-dtype int8 \
    >> logs/r05_pareto.jsonl 2>logs/r05_pareto_last_stderr.log \
    || echo "{\"pareto_desc\": \"pareto 1x4\", \"error\": \"rc=$?\"}" >> logs/r05_pareto.jsonl

echo "PHASE6 DONE $(date -u +%FT%TZ)" > logs/r05_phase6.done
