#!/bin/bash
# Round-3 TPU golden regression artifact (VERDICT r2 item 1).
# Warm the exec cache first (scripts/warm_goldens.py); one chip
# process at a time: run only when the TPU is free.
cd "$(dirname "$0")/.."
exec python scripts/regression.py --arch tpu --or 0 --timeout 60 \
    2>&1 | tee REGRESSION_TPU_r03.log
