#!/usr/bin/env python
"""Auto-cap calibrator consistency check (VERDICT r4 item 6 done
criteria): run solve() N times on an instance with calibration enabled
and report the chosen cap each run; the calibrator should pick the
A/B-known optimum (benchmarks/bench_ab_wordpress_r5.jsonl: cap 4 on
wordpress; bench_ab_pat13_r5.jsonl: the pat13 argmax) consistently.

  python scripts/check_autocap.py [instance] [runs] [solve_seconds]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INSTANCE = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/benchmarks/example_wordpress7_500.fzn")
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SOLVE_S = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
DIVES = int(os.environ.get("BENCH_DIVES", "256"))


def main():
    import jax

    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    print(f"devices: {jax.devices()}", flush=True)
    tnf = compile_model(parse_fzn(INSTANCE))
    name = os.path.basename(INSTANCE)
    chosen = []
    for run in range(1, RUNS + 1):
        s = BatchedSolver(tnf, EngineConfig(
            num_dives=DIVES, subproblems_power=14, max_depth=256,
            fp_max_iters=16,
            fp_mode=os.environ.get("BENCH_FP_MODE", "fixpoint"),
            fp_layout=os.environ.get("BENCH_FP_LAYOUT", "vd"),
            use_table=bool(int(os.environ.get("BENCH_TABLE", "0")))))
        t0 = time.monotonic()
        r = s.solve(timeout_s=SOLVE_S, chunk=64, verbose=True)
        cap = getattr(s, "last_auto_cap", None)
        chosen.append(cap)
        print(f"run {run}/{RUNS}: chosen fp_cap={cap} "
              f"best={r.objective} nodes={r.nodes} "
              f"({time.monotonic()-t0:.1f}s)", flush=True)
    print(f"CHOSEN {name}: {chosen} "
          f"(consistent={len(set(chosen)) == 1})", flush=True)


if __name__ == "__main__":
    main()
