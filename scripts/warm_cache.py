#!/usr/bin/env python
"""Pre-compile (warm) the executable cache for the bench configuration.

The axon TPU relay compiles XLA programs remotely (5-40+ min per
program, high variance); solver/exec_cache.py persists serialized PJRT
executables keyed by lowered-HLO hash so each program ever compiles
once per machine. Run this after any change to the engine/plan/kernel
code paths so the round-end benchmark hits the cache instead of paying
a cold compile inside its budget.

Builds the solver through the SAME construction path bench.py uses
(identical EngineConfig incl. table mode => identical program keys):
the table dive-level program, init_state, and the traced-budget step
program all compile (or alias-load) here.

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
CHUNK = int(os.environ.get("BENCH_CHUNK", "64"))


def main():
    t0 = time.monotonic()
    import jax
    import jax.numpy as jnp

    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    print(f"devices: {jax.devices()}", flush=True)
    tnf = compile_model(parse_fzn(INSTANCE))
    print(f"model: V={tnf.num_vars} P={tnf.num_props} "
          f"({time.monotonic()-t0:.1f}s)", flush=True)
    # MUST mirror bench.py's EngineConfig exactly (same program keys).
    solver = BatchedSolver(tnf, EngineConfig(
        num_dives=DIVES, subproblems_power=14, max_depth=256,
        fp_max_iters=16,
        fp_mode=os.environ.get("BENCH_FP_MODE", "fixpoint"),
        fp_layout=os.environ.get("BENCH_FP_LAYOUT", "vd"),
        gather_mode=os.environ.get("BENCH_GATHER_MODE", "take"),
        use_table=bool(int(os.environ.get("BENCH_TABLE", "0")))))
    if solver.use_table:
        t1 = time.monotonic()
        solver.get_table(0)
        print(f"warm: table build {time.monotonic()-t1:.1f}s", flush=True)
    st = solver.init_state()
    t1 = time.monotonic()
    step_fn = solver.make_step_budget()
    st = step_fn(st, jnp.int32(CHUNK))[0]
    # A real fetch proves the program is loaded and the chunk ran (the
    # relay returns early from block_until_ready on deserialized
    # executables).
    jax.device_get(st.phase)
    print(f"warm: compile+first chunk {time.monotonic()-t1:.1f}s "
          f"(total {time.monotonic()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
