#!/bin/bash
# TPU golden regression artifact (VERDICT r2 item 1 / r4 item 2).
# Warm the exec cache first (scripts/warm_goldens.py); one chip
# process at a time: run only when the TPU is free.
#   scripts/run_regression_tpu.sh [logfile]
cd "$(dirname "$0")/.."
LOG="${1:-benchmarks/regression_tpu_r5.log}"
exec python scripts/regression.py --arch tpu --or 0 --timeout 60 \
    2>&1 | tee "$LOG"
