#!/usr/bin/env python
"""End-to-end TPU evidence for the three shipped benchmarks
(VERDICT r2 item 2): wordpress7_500, accap_a3, trains15
(/root/reference/benchmarks, run as the headline workloads by
hpc/run-helios.sh:21).

Per instance: cold/warm compile time, estimated vs device-reported HBM
footprint, steady-state nodes/s + deductions/s, bound trajectory,
best_bound at the end of the window.

  nohup python scripts/bench_big.py > /tmp/bench_big.log 2>&1 &
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--instances",
                    default="example_wordpress7_500,accap_a3,trains15")
    ap.add_argument("--measure-s", type=float, default=90.0)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--out", default="/tmp/bench_big.jsonl")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--compare",
                    default=os.path.join(REPO, "benchmarks",
                                         "bench_big_tpu_r3.jsonl"),
                    help="prior-round jsonl: flag search-quality "
                         "regressions by comparing the bound reached "
                         "at equal wall time (VERDICT r3 item 9), not "
                         "just nodes/s")
    args = ap.parse_args()

    baselines = {}
    if args.compare and os.path.exists(args.compare):
        for line in open(args.compare):
            try:
                r = json.loads(line)
                baselines[r.get("instance")] = r
            except Exception:
                pass

    def bound_at(traj, t):
        b = None
        for tt, bb in traj:
            if tt <= t:
                b = bb
        return b

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig
    from turbo_tpu.solver.plan import auto_num_dives

    log(f"devices: {jax.devices()}")
    for name in args.instances.split(","):
        path = f"/root/reference/benchmarks/{name}.fzn"
        row = {"instance": name.replace("example_", "")}
        try:
            t0 = time.monotonic()
            tnf = compile_model(parse_fzn(path))
            row["host_compile_s"] = round(time.monotonic() - t0, 1)
            D = auto_num_dives(tnf)
            t0 = time.monotonic()
            solver = BatchedSolver(tnf, EngineConfig(num_dives=D,
                                                     fp_max_iters=16))
            row["D"] = D
            row["max_depth"] = solver.cfg.max_depth
            row["k"] = solver.k
            p = solver.plan
            elem_cells = int(p.E * (p.e_tab.shape[1] if p.e_tab is not None else 0))
            lin_cells = int(3 * p.L_terms)
            per_dive = 4 * (2 * p.V + 26 * p.P
                            + 2 * (elem_cells + 8 * p.M + lin_cells))
            # State footprint: stores (6 planes) + stacks (7 x MAXD).
            state_bytes = 4 * D * (6 * p.V + 7 * solver.cfg.max_depth + 32)
            row["est_sweep_mb"] = round(per_dive * D / 2**20, 1)
            row["est_state_mb"] = round(state_bytes / 2**20, 1)
            st = solver.init_state()
            step_n = solver.make_step_n(args.chunk)
            t1 = time.monotonic()
            st = step_n(st)
            nodes0 = int(np.asarray(jax.device_get(st.nodes)).sum())
            deds0 = float(np.asarray(jax.device_get(st.deds)).sum())
            row["device_compile_s"] = round(time.monotonic() - t1, 1)
            try:
                ms = jax.devices()[0].memory_stats()
                row["hbm_in_use_mb"] = round(
                    ms.get("bytes_in_use", 0) / 2**20, 1)
            except Exception:
                pass
            log(f"{name}: D={D} depth={solver.cfg.max_depth} "
                f"compile={row['device_compile_s']}s")
            t0 = time.monotonic()
            traj = []
            steps = 0
            while time.monotonic() - t0 < args.measure_s:
                st = step_n(st)
                steps += args.chunk
                if steps % (args.chunk * 8) == 0:
                    traj.append((round(time.monotonic() - t0, 2),
                                 int(jax.device_get(st.best_bound).min())))
            got = jax.device_get((st.nodes, st.deds, st.best_bound,
                                  st.phase, st.sols))
            dt = time.monotonic() - t0
            row.update({
                "measure_s": round(dt, 1),
                "nodes_per_s": round(
                    (int(np.asarray(got[0]).sum()) - nodes0) / dt, 1),
                "deductions_per_s": round(
                    (float(np.asarray(got[1]).sum()) - deds0) / dt, 1),
                "best_bound": int(np.asarray(got[2]).min()),
                "idle_lanes": int((np.asarray(got[3]) == 2).sum()),
                "solutions": int(np.asarray(got[4]).sum()),
                "trajectory": traj,
            })
            base = baselines.get(row["instance"])
            if base and base.get("trajectory") and traj:
                t_cmp = min(traj[-1][0], base["trajectory"][-1][0])
                ours = bound_at(traj, t_cmp)
                prev = bound_at(base["trajectory"], t_cmp)
                if ours is not None and prev is not None:
                    row["t_cmp_s"] = t_cmp
                    row["bound_at_t"] = ours
                    row["baseline_bound_at_t"] = prev
                    # Minimization: a regression is a clearly WORSE
                    # (higher) bound at equal wall time.
                    margin = max(1.0, 0.02 * abs(prev))
                    row["bound_regressed"] = bool(ours > prev + margin)
                    if row["bound_regressed"]:
                        log(f"{name}: BOUND REGRESSION vs baseline: "
                            f"{ours} > {prev} @ {t_cmp}s")
        except Exception as e:
            import traceback
            row["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
