#!/usr/bin/env python
"""A/B matrix on the headline instance (VERDICT r2 item 3).

One process, one chip: for each (fp_mode, fp_layout, chunk, max_depth)
variant, compile (disk-cached) and measure steady-state nodes/s,
deductions/s and the bound trajectory, writing one JSON line per
variant. Variants share the warm process so the relay/compile overhead
is paid once each, sequentially.

  nohup python scripts/bench_ab.py > /tmp/bench_ab.log 2>&1 &
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(f"% {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default=(
        "/root/reference/benchmarks/example_wordpress7_500.fzn"))
    ap.add_argument("--dives", type=int, default=256)
    ap.add_argument("--sub", type=int, default=14,
                    help="subproblems power (match the proof config "
                         "under test; 14 was the round-2 default)")
    ap.add_argument("--measure-s", type=float, default=45.0)
    ap.add_argument("--fp-cap", type=int, default=16)
    ap.add_argument("--variants", default=(
        "fixpoint:dv:64:256,fixpoint:vd:64:256,wac1:dv:64:256,"
        "fixed2:dv:64:256,fixpoint:dv:16:256,fixpoint:dv:64:0"),
        help="comma list of mode:layout:chunk:maxdepth[:gather[:table]] "
             "(mode fixedN = fixed sweeps with N iters; maxdepth 0 = "
             "auto; gather take|onehot; table t1|t0 for the EPS "
             "subproblem-root table on/off, default t1)")
    ap.add_argument("--caps", default="",
                    help="extra fixpoint-cap sweep values (traced: no "
                         "recompile), applied to every variant")
    ap.add_argument("--out", default="/tmp/bench_ab.jsonl")
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
    tnf = compile_model(parse_fzn(args.instance))
    inst = os.path.splitext(os.path.basename(args.instance))[0]
    inst = inst.replace("example_", "")

    for spec in args.variants.split(","):
        parts = spec.split(":")
        mode, layout, chunk, maxd = parts[:4]
        gather = parts[4] if len(parts) > 4 else "take"
        use_table = (parts[5] != "t0") if len(parts) > 5 else True
        chunk, maxd = int(chunk), int(maxd)
        fixed_iters = 2
        if mode.startswith("fixed") and mode != "fixed":
            fixed_iters = int(mode[len("fixed"):])
            mode_cfg = "fixed"
        else:
            mode_cfg = mode
        row = {"instance": inst, "D": args.dives, "mode": mode,
               "layout": layout, "chunk": chunk, "max_depth": maxd,
               "gather": gather, "table": use_table,
               "fp_cap": args.fp_cap}
        try:
            import jax.numpy as jnp
            t0 = time.monotonic()
            solver = BatchedSolver(tnf, EngineConfig(
                num_dives=args.dives, subproblems_power=args.sub,
                max_depth=maxd, fp_max_iters=args.fp_cap,
                fp_mode=mode_cfg, fp_layout=layout,
                fp_fixed_iters=fixed_iters, gather_mode=gather,
                use_table=use_table))
            if solver.use_table:
                tb = time.monotonic()
                solver.get_table(0)
                row["table_build_s"] = round(time.monotonic() - tb, 1)
            step_n = solver.make_step_n(chunk)
            compile_s = None
            caps = [args.fp_cap] + [int(c) for c in args.caps.split(",")
                                    if c]
            for cap in caps:
                st = solver.init_state()
                st = st._replace(fp_cap=jnp.full((args.dives,), cap,
                                                 dtype=jnp.int32))
                t0 = time.monotonic()
                st = step_n(st)
                nodes0 = int(np.asarray(jax.device_get(st.nodes)).sum())
                deds0 = float(np.asarray(jax.device_get(st.deds)).sum())
                if compile_s is None:
                    compile_s = round(time.monotonic() - t0, 1)
                    log(f"{spec}: compile+first chunk {compile_s}s")
                t0 = time.monotonic()
                traj = []
                steps = 0
                while time.monotonic() - t0 < args.measure_s:
                    st = step_n(st)
                    steps += chunk
                    if steps % 256 == 0:
                        traj.append((round(time.monotonic() - t0, 2),
                                     int(jax.device_get(st.best_bound).min())))
                got = jax.device_get((st.nodes, st.deds, st.best_bound,
                                      st.fpit, st.nonexh))
                dt = time.monotonic() - t0
                out = dict(row)
                out.update({
                    "fp_cap": cap,
                    "compile_s": compile_s,
                    "measure_s": round(dt, 1),
                    "steps_per_s": round(steps / dt, 1),
                    "nodes_per_s": round(
                        (int(np.asarray(got[0]).sum()) - nodes0) / dt, 1),
                    "deductions_per_s": round(
                        (float(np.asarray(got[1]).sum()) - deds0) / dt, 1),
                    "best_bound": int(np.asarray(got[2]).min()),
                    "nonexh_lanes": int(np.asarray(got[4]).sum()),
                    "trajectory": traj[-8:],
                })
                print(json.dumps(out), flush=True)
                with open(args.out, "a") as f:
                    f.write(json.dumps(out) + "\n")
            continue
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
