#!/bin/sh
# Round-5 follow-up chip queue. The r05_master queue completed its
# headline / pareto / quant phases, but the gated-parity audit (P2) and
# the train bench (P3) both ran inside a wedged-chip window
# (01:54-02:22Z: every test ABORTED on its first device allocation and
# --train hit RESOURCE_EXHAUSTED at the frozen-ViT encode; the pareto
# runs starting 02:23Z on the same tree all succeeded). This queue
# re-runs exactly those two, then one plain-default bench.py run to
# confirm the newly pinned defaults (4x12, kv=int8, no-overlap,
# median-of-3) reproduce the adjudicated headline.
set -x
cd "$(git rev-parse --show-toplevel)"
mkdir -p logs docs/artifacts

AUDIT=logs/parity_r05b.txt
{
    echo "# Gated-parity audit — round 5 (take 3)"
    echo "date: $(date -u +%FT%TZ)"
    echo "host: one TPU v5e chip via axon tunnel (exclusive)"
    echo "cmd: INTERNNAV_TPU_TESTS=1 pytest tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m ''"
    echo "note: takes 1 (2026-08-19T20:28Z) and 2 (2026-08-20T01:54Z) both"
    echo "      aborted wholesale against a wedged chip (every test ABORTED"
    echo "      on its first device allocation; unrelated runs minutes later"
    echo "      succeeded, so the failures are chip-state, not code)."
} > "$AUDIT"
INTERNNAV_TPU_TESTS=1 timeout 5400 python -m pytest \
    tests/test_ops_attention.py tests/test_kv_quant.py -q -rA -m '' \
    >> "$AUDIT" 2>&1
echo "exit: $?" >> "$AUDIT"
echo "PARITY DONE $(date -u +%FT%TZ)" > logs/r05b_parity.done

timeout 2400 python bench.py --train > logs/r05b_train.json 2> logs/r05b_train.err \
    || echo "{\"train_error\": \"rc=$?\"}" >> logs/r05b_train.json
echo "TRAIN DONE $(date -u +%FT%TZ)" > logs/r05b_train.done

timeout 3600 python bench.py > logs/r05b_default_headline.json \
    2> logs/r05b_default_headline.err \
    || echo "{\"headline_error\": \"rc=$?\"}" >> logs/r05b_default_headline.json
echo "DEFAULT HEADLINE DONE $(date -u +%FT%TZ)" > logs/r05b_headline.done

echo "FOLLOWUP DONE $(date -u +%FT%TZ)" > logs/r05b_followup.done
