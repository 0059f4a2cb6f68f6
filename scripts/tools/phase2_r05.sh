#!/bin/sh
# Round-5 chip phase 2: runs AFTER sweep_r05.sh completes (waits on its
# DONE marker). One chip process at a time — this script is the only
# consumer once the sweep exits.
#
#   1. compare-quant-sequential with the int8 KV cache stacked on W8A8
#      (VERDICT r4 #5): the deployed config's full quality story in one
#      comparison.
#   2. packed-8192 N1 train-step throughput (VERDICT r4 #7).
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs

while ! grep -q "SWEEP DONE" logs/r05_sweep.jsonl 2>/dev/null; do
    sleep 30
done

timeout 3600 python bench.py --compare-quant-sequential --quant-layers 20 \
    --kv-dtype int8 > logs/r05_quant_kv8.json 2>logs/r05_quant_kv8.err
echo "quant rc=$?"

timeout 2400 python bench.py --train > logs/r05_train.json 2>logs/r05_train.err
echo "train rc=$?"

echo "PHASE2 DONE $(date -u +%FT%TZ)" > logs/r05_phase2.done
