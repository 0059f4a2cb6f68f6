#!/bin/sh
# Round-5 chip phase 5: runs AFTER phase4_r05.sh (waits on its marker).
#
#   1. RE-RUN of the gated-parity audit (VERDICT r4 #3). The 20:28 UTC
#      attempt ABORTED wholesale — every device_put failed with "TPU
#      backend error (Aborted)" right after phase2's bench_train OOM
#      (RESOURCE_EXHAUSTED) wedged the tunnel chip; the chip recovered by
#      21:04 (pareto runs fine since). Exclusive hold, fresh process.
#   2. bench.py --train (VERDICT r4 #7): the OOM is fixed by bf16 Adam
#      moment storage (trainer/base.py scale_by_adam_sd) — fp32 m/v for
#      1.56B trainable params was 12.5 GB on a 16 GB chip.
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs docs/artifacts

while [ ! -f logs/r05_phase4.done ]; do sleep 30; done

AUDIT=docs/artifacts/parity_r05.txt
{
    echo "# Gated-parity audit — round 5"
    echo "date: $(date -u +%FT%TZ)"
    echo "host: one TPU v5e chip via axon tunnel (exclusive)"
    echo "cmd: INTERNNAV_TPU_TESTS=1 pytest tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m ''"
    echo "note: re-run; the 20:28Z attempt aborted against a wedged chip"
    echo "      (bench_train RESOURCE_EXHAUSTED at 20:25Z poisoned the"
    echo "      tunnel backend; every subsequent device_put ABORTED)."
} > "$AUDIT"
INTERNNAV_TPU_TESTS=1 timeout 5400 python -m pytest \
    tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m '' \
    >> "$AUDIT" 2>&1
echo "exit: $?" >> "$AUDIT"

timeout 3600 python bench.py --train \
    > logs/r05_train.json 2> logs/r05_train.err \
    || echo "{\"train_error\": \"rc=$?\"}" >> logs/r05_train.json

echo "PHASE5 DONE $(date -u +%FT%TZ)" > logs/r05_phase5.done
