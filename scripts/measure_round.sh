#!/bin/bash
# Round-end hardware measurement battery (~35 min on a healthy chip).
# Run when the TPU tunnel is healthy (probe first: a tiny jit under
# `timeout 60` — see CLAUDE.md on tunnel wedges). Only ONE process may
# use the chip; never run two of these concurrently.
#
#   bash scripts/measure_round.sh [logdir]
set -x
LOG=${1:-/tmp}
cd "$(dirname "$0")/.."
# 1. scoreboard (median-of-3 per config + train-step leg + drift re-measure
#    since round 5; daemon-thread watchdog inside)
timeout 2900 python bench.py 2>"$LOG/m_bench.err" | tee "$LOG/m_bench.log"
# 1b. batch 48/64 headline probe
timeout 900 python scripts/bench_batch_probe.py 2>&1 | tail -4 | tee "$LOG/m_batch.log"
# 2. serving e2e: pipelined (depth 2, default) vs serial (depth 0)
timeout 900 python scripts/bench_predictor_e2e.py 4 uint8 float32 2 2>&1 | tail -8 | tee "$LOG/m_pred_d2.log"
timeout 900 python scripts/bench_predictor_e2e.py 4 uint8 float32 0 2>&1 | tail -8 | tee "$LOG/m_pred_d0.log"
# 3. bf16 fetch A/B at depth 2
timeout 900 python scripts/bench_predictor_e2e.py 4 uint8 bfloat16 2 2>&1 | tail -8 | tee "$LOG/m_pred_bf16.log"
# 4. full evaluate CLI e2e (scoring included; depth 4 = shipped default)
timeout 1800 python scripts/bench_evaluate_e2e.py 4 4 2>&1 | tail -4 | tee "$LOG/m_eval.log"
# 5. TPU-platform AOT export smoke
timeout 600 python scripts/smoke_export_tpu.py 2>&1 | tail -3 | tee "$LOG/m_export.log"
echo ALL MEASUREMENTS DONE
