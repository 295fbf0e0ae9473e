#!/usr/bin/env python
"""Pre-compile (warm) the executable cache for the bench configuration.

The axon TPU relay compiles XLA programs remotely (5-40+ min per
program, high variance); solver/exec_cache.py persists serialized PJRT
executables keyed by lowered-HLO hash so each program ever compiles
once per machine. Run this after any change to the engine/plan/kernel
code paths so the round-end benchmark hits the cache instead of paying
a cold compile inside its budget.

Usage:
  nohup python scripts/warm_cache.py > /tmp/warm.log 2>&1 &
  BENCH_DIVES=512 python scripts/warm_cache.py   # warm another shape
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INSTANCE = os.environ.get(
    "BENCH_INSTANCE",
    "/root/reference/benchmarks/example_wordpress7_500.fzn")
DIVES = int(os.environ.get("BENCH_DIVES", "256"))
FP_CAP = int(os.environ.get("BENCH_FP_CAP", "16"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "16"))


def main():
    t0 = time.monotonic()
    import jax

    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    print(f"devices: {jax.devices()}", flush=True)
    tnf = compile_model(parse_fzn(INSTANCE))
    print(f"model: V={tnf.num_vars} P={tnf.num_props} "
          f"({time.monotonic()-t0:.1f}s)", flush=True)
    solver = BatchedSolver(tnf, EngineConfig(
        num_dives=DIVES, subproblems_power=14, max_depth=256,
        fp_max_iters=FP_CAP))
    st = solver.init_state()
    t1 = time.monotonic()
    step_n = solver.make_step_n(CHUNK)
    st = step_n(st)
    jax.block_until_ready(st.lb)
    print(f"warm: compile+first chunk {time.monotonic()-t1:.1f}s "
          f"(total {time.monotonic()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
