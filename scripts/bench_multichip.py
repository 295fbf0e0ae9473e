#!/usr/bin/env python
"""Multi-chip scaling study on the virtual CPU mesh (VERDICT r2 §8).

Measures nodes/s and EPS redistribution counts at 1/2/4/8 shards on a
mid-size instance, so the shard_map + host-rebalance machinery has a
recorded benefit (SURVEY §7 stage 6 "measure dives/s scaling"). Runs
on the CPU platform with XLA-forced virtual devices — real multi-chip
hardware is not available here; per-shard *scaling shape* (not absolute
nodes/s) is the signal.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_multichip.py [--instance path] [--measure-s 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default=(
        "/root/reference/benchmarks/test_data/sudoku_opt_p0.fzn"))
    ap.add_argument("--dives", type=int, default=32,
                    help="lanes PER SHARD (fixed per-shard work => "
                         "ideal scaling doubles nodes/s per doubling)")
    ap.add_argument("--measure-s", type=float, default=30.0)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--sub", type=int, default=13)
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument("--out", default="/tmp/multichip_scaling.jsonl")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.solver.engine import EngineConfig
    from turbo_tpu.parallel.mesh import ShardedSolver

    devs = jax.devices()
    print(f"% devices: {len(devs)}", file=sys.stderr, flush=True)
    tnf = compile_model(parse_fzn(args.instance))
    inst = os.path.splitext(os.path.basename(args.instance))[0]

    for n in [int(x) for x in args.shards.split(",")]:
        cfg = EngineConfig(num_dives=args.dives,
                           subproblems_power=args.sub, fp_max_iters=16)
        s = ShardedSolver(tnf, cfg, devices=devs[:n])
        t0 = time.monotonic()
        r = s.solve(timeout_s=args.measure_s, chunk=args.chunk)
        dt = time.monotonic() - t0
        row = {"instance": inst, "shards": n, "dives_per_shard": args.dives,
               "nodes": r.nodes, "nodes_per_s": round(r.nodes / r.solve_time
                                                      if r.solve_time else 0.0, 1),
               "solve_s": round(r.solve_time, 1), "wall_s": round(dt, 1),
               "status": r.status, "objective": r.objective,
               "redistributions": getattr(r, "eps_redistributions", 0),
               "solved_sub": r.eps_solved_subproblems,
               "skipped_sub": r.eps_skipped_subproblems}
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
