#!/usr/bin/env python
"""Per-chunk occupancy probe for a straggler golden on real hardware.

Builds the solver EXACTLY as scripts/regression.py does (same config =>
same cached executable) and runs solve(verbose=True), which prints one
line per chunk: wall time, cumulative nodes, DIVE/SOLVE/IDLE histogram
and the refill-counter position. This is the measurement that separates
the two hypotheses for the 60 s straggler misses (DESIGN.md round-3
chip evidence): slow steps at full occupancy (kernel cost) vs fast
steps with starved lanes (EPS skew / dive replay).

  python scripts/probe_occupancy.py pat13 --timeout 90
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("instance", nargs="?", default="pat13")
    ap.add_argument("--timeout", type=float, default=90.0)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--or", dest="or_nodes", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from scripts.regression import make_solver
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model

    path = args.instance
    if not os.path.exists(path):
        path = f"/root/reference/benchmarks/test_data/{args.instance}.fzn"
    tnf = compile_model(parse_fzn(path))
    s = make_solver(tnf, "tpu", args.or_nodes)
    print(f"% D={s.cfg.num_dives} k={s.k} max_depth={s.cfg.max_depth} "
          f"V={s.plan.V} P={s.plan.P}", flush=True)
    t0 = time.time()
    r = s.solve(timeout_s=args.timeout, chunk=args.chunk, verbose=True)
    print(f"% status={r.status} obj={r.objective} nodes={r.nodes} "
          f"solve_time={r.solve_time:.1f}s wall={time.time()-t0:.1f}s "
          f"sub={r.eps_solved_subproblems}+{r.eps_skipped_subproblems}skip"
          f"/{r.eps_num_subproblems}", flush=True)


if __name__ == "__main__":
    main()
