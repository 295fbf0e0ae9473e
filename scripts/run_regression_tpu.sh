#!/bin/bash
# Round-2 TPU golden regression artifact (VERDICT item 2).
# One chip process at a time: run only when the TPU is free.
cd "$(dirname "$0")/.."
exec python scripts/regression.py --arch tpu --or 0 --timeout 60 \
    2>&1 | tee REGRESSION_TPU_r02.log
