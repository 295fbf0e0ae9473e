#!/usr/bin/env python
"""D-scaling study on real hardware (VERDICT r1 item 1).

For each lane count D in --dives, measure steady-state nodes/s,
per-chunk device time, deductions/s and the profiler-measured
FIXPOINT/SEARCH split on the headline instance. Writes one JSON line
per point to --out (append), so a partial sweep still leaves data.

Run AFTER confirming the chip is free (one TPU process at a time):
    nohup python scripts/bench_scaling.py > /tmp/scaling.log 2>&1 &
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"% {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default=os.path.join(
        "/root/reference/benchmarks", "example_wordpress7_500.fzn"))
    ap.add_argument("--dives", default="256,512,1024,2048")
    ap.add_argument("--measure-s", type=float, default=60.0)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--fp-cap", type=int, default=16)
    ap.add_argument("--fp-layout", default="dv", choices=["dv", "vd"])
    ap.add_argument("--fp-mode", default="fixpoint",
                    choices=["fixpoint", "fixed", "wac1"])
    ap.add_argument("--fp-fixed-iters", type=int, default=2)
    ap.add_argument("--max-depth", type=int, default=256)
    ap.add_argument("--out", default="/tmp/scaling_results.jsonl")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    log(f"devices: {jax.devices()}")
    platform = jax.devices()[0].platform
    tnf = compile_model(parse_fzn(args.instance))
    log(f"model: V={tnf.num_vars} P={tnf.num_props}")
    inst = os.path.splitext(os.path.basename(args.instance))[0]
    inst = inst.replace("example_", "")

    for D in [int(x) for x in args.dives.split(",")]:
        row = {"instance": inst, "platform": platform, "D": D,
               "chunk": args.chunk, "fp_cap": args.fp_cap,
               "fp_layout": args.fp_layout, "fp_mode": args.fp_mode,
               "max_depth": args.max_depth}
        t0 = time.monotonic()
        solver = BatchedSolver(tnf, EngineConfig(
            num_dives=D, subproblems_power=14, max_depth=args.max_depth,
            fp_max_iters=args.fp_cap, fp_layout=args.fp_layout,
            fp_mode=args.fp_mode, fp_fixed_iters=args.fp_fixed_iters))
        st = solver.init_state()
        step_n = solver.make_step_n(args.chunk)
        st = step_n(st)
        jax.block_until_ready(st.lb)
        row["compile_s"] = round(time.monotonic() - t0, 1)
        log(f"D={D}: compile+first chunk {row['compile_s']}s")

        # Steady-state measurement with per-chunk timing.
        nodes0 = int(np.asarray(jax.device_get(st.nodes)).sum())
        deds0 = float(np.asarray(jax.device_get(st.deds)).sum())
        chunk_times = []
        t0 = time.monotonic()
        while time.monotonic() - t0 < args.measure_s:
            tc = time.monotonic()
            st = step_n(st)
            jax.block_until_ready(st.phase)
            chunk_times.append(time.monotonic() - tc)
        dt = time.monotonic() - t0
        got = jax.device_get((st.nodes, st.deds, st.best_bound, st.fpit,
                              st.phase))
        nodes1 = int(np.asarray(got[0]).sum())
        deds1 = float(np.asarray(got[1]).sum())
        ct = np.array(chunk_times)
        row.update({
            "measure_s": round(dt, 1),
            "nodes": nodes1 - nodes0,
            "nodes_per_s": round((nodes1 - nodes0) / dt, 1),
            "deductions_per_s": round((deds1 - deds0) / dt, 1),
            "nodes_per_s_per_dive": round((nodes1 - nodes0) / dt / D, 2),
            "chunk_ms_mean": round(float(ct.mean()) * 1e3, 2),
            "chunk_ms_p50": round(float(np.percentile(ct, 50)) * 1e3, 2),
            "chunk_ms_p95": round(float(np.percentile(ct, 95)) * 1e3, 2),
            "best_bound": int(np.asarray(got[2]).min()),
            "fixpoint_iters": int(np.asarray(got[3]).sum()),
            "idle_lanes": int((np.asarray(got[4]) == 2).sum()),
        })

        # Profiler-measured FIXPOINT/SEARCH split on two more chunks.
        try:
            from turbo_tpu.solver import profile_split
            hlo = solver.step_hlo_text(args.chunk)
            if hlo is not None:
                def _chunk():
                    nonlocal st
                    st = step_n(st)
                    jax.block_until_ready(st.phase)
                frac = profile_split.measure_fixpoint_fraction(_chunk, hlo)
                if frac is not None:
                    row["fixpoint_frac_measured"] = round(frac, 4)
        except Exception as e:
            row["profile_error"] = str(e)

        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
