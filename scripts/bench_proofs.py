#!/usr/bin/env python
"""Proof-time matrix for the golden timeout instances (round 3).

For each (instance, subproblems_power k, fp_mode) combination, run the
batched engine to completion (or --timeout) on the real chip and
record proof wall time. This is the direct metric behind closing the
33/33 regression: the auto factor-based k (2^19 at D=1024) drowns
~100k-node proof trees in dive-replay overhead (measured: pat13 93%+
of lanes in DIVE phase, 10M visits for a 136k-node tree).

  nohup python scripts/bench_proofs.py > /tmp/bench_proofs.log 2>&1 &
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", default="pat13,pat12,triangular9")
    ap.add_argument("--dives", type=int, default=1024)
    ap.add_argument("--subs", default="13,15,17")
    ap.add_argument("--modes", default="fixpoint")
    ap.add_argument("--caps", default="16",
                    help="fp_max_iters sweep; the cap is TRACED state "
                         "(SearchState.fp_cap), so every value reuses "
                         "the same cached executable")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--timeout", type=float, default=90.0)
    ap.add_argument("--out", default="/tmp/proof_matrix.jsonl")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    print(f"% devices: {jax.devices()}", file=sys.stderr, flush=True)
    for name in args.instances.split(","):
        tnf = compile_model(parse_fzn(
            f"/root/reference/benchmarks/test_data/{name}.fzn"))
        for mode in args.modes.split(","):
            fixed_iters = 2
            mode_cfg = mode
            if mode.startswith("fixed") and mode != "fixed":
                fixed_iters = int(mode[len("fixed"):])
                mode_cfg = "fixed"
            for sub in [int(x) for x in args.subs.split(",")]:
              for cap in [int(x) for x in args.caps.split(",")]:
                row = {"instance": name, "D": args.dives, "sub": sub,
                       "mode": mode, "cap": cap, "chunk": args.chunk}
                try:
                    s = BatchedSolver(tnf, EngineConfig(
                        num_dives=args.dives, subproblems_power=sub,
                        fp_max_iters=cap, fp_mode=mode_cfg,
                        fp_fixed_iters=fixed_iters))
                    t0 = time.monotonic()
                    r = s.solve(timeout_s=args.timeout, chunk=args.chunk)
                    row.update({
                        "status": r.status, "objective": r.objective,
                        "solve_s": round(r.solve_time, 1),
                        "wall_s": round(time.monotonic() - t0, 1),
                        "nodes": r.nodes,
                        "nodes_per_s": round(r.nodes / r.solve_time
                                             if r.solve_time else 0, 1),
                        "solved_sub": r.eps_solved_subproblems,
                        "skipped_sub": r.eps_skipped_subproblems,
                    })
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                print(json.dumps(row), flush=True)
                with open(args.out, "a") as f:
                    f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
