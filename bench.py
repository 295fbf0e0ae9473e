#!/usr/bin/env python
"""Benchmark driver: batched dive-and-solve throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: search nodes per second on the reference's headline instance
(example_wordpress7_500.fzn), steady-state (post-compile), matching the
reference's `nodes` / `solveTime` statistics definition
(statistics.hpp:340-346). The reference repo publishes no absolute
numbers (BASELINE.md); vs_baseline is measured against the recorded
best of previous rounds in BENCH_BASELINE.json when present.

Round-5 hardening (VERDICT r4 item 1): every stage announces start and
finish on stderr with a heartbeat thread so a hung relay call can never
produce a silent empty artifact; the EPS table build runs under a
deadline (engine falls back to dive mode on overrun); and the
measurement runs at the best cap of an inline fixpoint-cap sweep
(the cap plane is traced state — zero recompiles) with the vd layout
the round-4 A/B measured ahead at every cap.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

INSTANCE = os.environ.get(
    "BENCH_INSTANCE",
    "/root/reference/benchmarks/example_wordpress7_500.fzn")
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
MEASURE_S = float(os.environ.get("BENCH_MEASURE_S", "60"))
DIVES = int(os.environ.get("BENCH_DIVES", "256"))
# Default: the committed chip A/B's measured optimum on this instance
# (benchmarks/bench_ab_wordpress_r5.jsonl: cap 4 wins both the table
# and no-table D=256 legs at 30 s windows, and the best bound
# trajectory). A live 3 s/point sweep (BENCH_FP_CAP=0) re-picks it
# only ~half the time — too noisy for the round's one-shot artifact.
FP_CAP = int(os.environ.get("BENCH_FP_CAP", "4"))  # 0 = sweep
# Caps swept when BENCH_FP_CAP=0; ~2 s of device time each, every
# sweep chunk is real solve progress (sound at any cap — hold rule).
CAPS = [int(c) for c in os.environ.get("BENCH_CAPS", "2,3,4,8,16").split(",")]
SWEEP_S = float(os.environ.get("BENCH_SWEEP_S", "3.0"))
# Steps fused into one device program. The TPU profile measured ~83ms
# of host/relay dispatch overhead per program call vs ~166ms of device
# compute for a 16-step chunk (33% overhead); 64 steps amortizes it to
# ~11%. The exec cache must be warmed for the chosen chunk size.
CHUNK = int(os.environ.get("BENCH_CHUNK", "64"))
T_START = time.monotonic()


def log(msg):
    print(f"% [{time.monotonic() - T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


@contextlib.contextmanager
def stage(name, heartbeat_s: float = 30.0):
    """Announce a stage and run a heartbeat so the driver's captured
    tail always shows WHERE the bench is (round-4's artifact was lost
    to a silent stage)."""
    log(f"stage: {name} ...")
    t0 = time.monotonic()
    done = threading.Event()

    def beat():
        while not done.wait(heartbeat_s):
            log(f"stage: {name} still running "
                f"({time.monotonic() - t0:.0f}s)")

    th = threading.Thread(target=beat, daemon=True)
    th.start()
    try:
        yield
    finally:
        done.set()
        log(f"stage: {name} done ({time.monotonic() - t0:.1f}s)")


def remaining():
    return BUDGET_S - (time.monotonic() - T_START)


INIT_TIMEOUT_S = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "300"))
INIT_ATTEMPTS = int(os.environ.get("BENCH_INIT_ATTEMPTS", "3"))
INIT_BACKOFF_S = float(os.environ.get("BENCH_INIT_BACKOFF_S", "45"))


def _init_devices():
    """Initialize the JAX backend with a watchdog.

    The axon TPU tunnel can hang indefinitely on init AND can recover
    after minutes of downtime, so one failed probe must not condemn the
    round's perf artifact: retry with backoff before any CPU fallback,
    and make the fallback loud (the caller marks the JSON line
    invalid_for_perf)."""
    import subprocess
    for attempt in range(1, INIT_ATTEMPTS + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=INIT_TIMEOUT_S, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            import jax
            return jax, "default"
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            log(f"device init probe {attempt}/{INIT_ATTEMPTS} failed "
                f"({type(e).__name__})")
            if attempt < INIT_ATTEMPTS:
                time.sleep(INIT_BACKOFF_S * attempt)
    log("!!! TPU unavailable after all probes; falling back to the CPU "
        "platform — this run is NOT a performance measurement")
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax, "cpu-fallback"


def main():
    import numpy as np
    with stage("device init"):
        jax, backend_mode = _init_devices()
    import jax.numpy as jnp

    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig

    log(f"devices: {jax.devices()} ({backend_mode})")
    with stage("model compile"):
        tnf = compile_model(parse_fzn(INSTANCE))
    log(f"compiled model: V={tnf.num_vars} P={tnf.num_props}")

    # Table default OFF for the bench: the r5 chip A/B
    # (benchmarks/bench_ab_wordpress_r5.jsonl) measured table vs
    # no-table within noise at every cap on wordpress (27.0k vs 27.3k
    # nodes/s at the cap-4 optimum) while the pinned -sub 14 build costs
    # ~1190 s of serial relay calls — pure artifact-budget risk for zero
    # throughput. (CLI runs use auto-k, which caps builds at ~8 calls;
    # this only affects the bench's pinned split.)
    use_table = bool(int(os.environ.get("BENCH_TABLE", "0")))
    solver = BatchedSolver(tnf, EngineConfig(
        num_dives=DIVES, subproblems_power=14, max_depth=256,
        fp_max_iters=max(CAPS + [FP_CAP, 16]),
        # fixpoint:vd: the round-4 chip A/B measured vd ahead of dv by
        # 3-5% at every cap and wac1 behind fixpoint at caps 4-16 (its
        # scatter-meet group loop costs more per sweep; DESIGN.md "the
        # fixpoint cap A/B") — these are also the EngineConfig defaults
        # the CLI runs with, so the headline measures the shipped config.
        fp_mode=os.environ.get("BENCH_FP_MODE", "fixpoint"),
        fp_layout=os.environ.get("BENCH_FP_LAYOUT", "vd"),
        gather_mode=os.environ.get("BENCH_GATHER_MODE", "take"),
        use_table=use_table))
    if solver.use_table:
        # Deadline so a slow relay can't eat the whole artifact budget:
        # the engine falls back to dive-mode refills on overrun.
        tbl_budget = min(
            float(os.environ.get("BENCH_TABLE_BUDGET_S", "420")),
            max(30.0, 0.4 * remaining()))
        solver._table_deadline = time.monotonic() + tbl_budget
        with stage(f"EPS table build (deadline {tbl_budget:.0f}s)"):
            if solver.get_table(0) is None:
                solver.disable_table()  # don't re-attempt in init_state
        log(f"table mode: {solver.use_table}")
    with stage("init_state (compile/load + table upload)"):
        st = solver.init_state()
    with stage("step program compile/load"):
        step_fn = solver.make_step_budget()

    def step_n(s):
        return step_fn(s, jnp.int32(CHUNK))[0]

    with stage("first chunk (program upload + execute)"):
        t0 = time.monotonic()
        st = step_n(st)
        # device_get, not block_until_ready: on the axon relay,
        # block_until_ready on a deserialized executable's outputs
        # returns immediately while the first execution (which uploads
        # the ~100MB program image through the tunnel, 100-400s) is
        # still in flight. Only a real fetch proves the program ran.
        nodes0 = int(np.asarray(jax.device_get(st.nodes)).sum())
        compile_s = time.monotonic() - t0
    log(f"XLA compile/load + first {CHUNK} steps: {compile_s:.1f}s")

    # Fixpoint-cap sweep (the round-4 A/B measured the cap as THE
    # dominant per-step knob; the optimum is instance-dependent). The
    # cap plane is traced state: switching costs no recompile, and
    # every sweep chunk is real solve progress under the hold rule.
    def set_cap(s, c):
        return s._replace(fp_cap=jnp.full((DIVES,), c, dtype=jnp.int32))

    best_cap = FP_CAP if FP_CAP > 0 else None
    if best_cap is None:
        rates = {}
        with stage(f"fp_cap sweep {CAPS}"):
            for cap in CAPS:
                if remaining() < MEASURE_S + 30.0:
                    log(f"sweep aborted early (budget): measured {rates}")
                    break
                st = set_cap(st, cap)
                # One rebase chunk so the sample starts at the new cap.
                st = step_n(st)
                n0 = int(np.asarray(jax.device_get(st.nodes)).sum())
                t0 = time.monotonic()
                while time.monotonic() - t0 < SWEEP_S:
                    st = step_n(st)
                    # Real sync per chunk: relay dispatch is async with
                    # no backpressure, so an unsynced 3 s dispatch loop
                    # can enqueue thousands of chunks (~hours of device
                    # work) that the next fetch must drain — the r5
                    # validation run stalled 12+ min in this loop. The
                    # ~83 ms dispatch floor this adds is uniform across
                    # caps, so the argmax is unaffected.
                    jax.device_get(st.phase)
                n1 = int(np.asarray(jax.device_get(st.nodes)).sum())
                dt = time.monotonic() - t0
                rates[cap] = (n1 - n0) / dt
                log(f"  cap {cap}: {rates[cap]:,.0f} nodes/s "
                    f"({dt:.1f}s sample)")
        best_cap = max(rates, key=rates.get) if rates else 16
        log(f"sweep winner: cap {best_cap}")
    st = set_cap(st, best_cap)
    st = step_n(st)  # rebase at the winning cap
    nodes0 = int(np.asarray(jax.device_get(st.nodes)).sum())

    t0 = time.monotonic()
    steps = 0
    # Always measure for at least 15s even if a cold compile consumed
    # the budget - a short valid measurement beats a zero division.
    measure_s = max(15.0, min(MEASURE_S, remaining() - 20.0))
    # Bound trajectory is always recorded: nodes/s alone is gameable
    # (a weaker fixpoint inflates nodes while slowing real search
    # progress, VERDICT r2); the (time, best_bound) curve proves the
    # measured throughput is doing real optimization work.
    trajectory = []
    with stage(f"measure window ({measure_s:.0f}s at cap {best_cap})"):
        while time.monotonic() - t0 < measure_s:
            st = step_n(st)
            steps += CHUNK
            if steps % 256 == 0:
                # Real sync (see above): device_get, not block_until_ready.
                bb = int(jax.device_get(st.best_bound).min())
                trajectory.append((round(time.monotonic() - t0, 2), bb))
        dt_dispatch = time.monotonic() - t0
        got = jax.device_get((st.nodes, st.best_bound, st.fpit, st.deds))
        dt = time.monotonic() - t0
    if dt - dt_dispatch > 1.0:
        log(f"final drain took {dt - dt_dispatch:.1f}s "
            f"(in-flight chunks at window end)")
    log(f"bound trajectory: {trajectory}")
    nodes1 = int(np.asarray(got[0]).sum())
    nodes_per_s = (nodes1 - nodes0) / dt
    bb = int(np.asarray(got[1]).min())
    fpit = int(np.asarray(got[2]).sum())
    deds = float(np.asarray(got[3]).sum())
    deds_per_s = deds / dt
    # Time at which the final best bound was first reached (within the
    # trajectory's chunk resolution).
    time_to_bound = next((t for t, b in trajectory if b == bb), dt)
    # HBM roofline for the propagation sweep (the hot loop): each AC-1
    # iteration streams the store planes, the role gathers, and the
    # candidate/native working tensors once per dive — the same
    # accounting auto_num_dives uses (plan.py). The sweep is gather/
    # bandwidth-bound (no MXU work), so deductions/s is capped at
    #   BW * real_props / per_dive_sweep_bytes.
    plan = solver.plan
    elem_cells = int(plan.E * (plan.e_tab.shape[1] if plan.e_tab is not None else 0))
    memb_cells = int(8 * plan.M)
    lin_cells = int(3 * plan.L_terms)
    per_dive_bytes = 4 * (2 * plan.V + 26 * plan.P
                          + 2 * (elem_cells + memb_cells + lin_cells))
    HBM_BW = float(os.environ.get("BENCH_HBM_GBPS", "819")) * 1e9  # v5e
    ceiling_deds = HBM_BW * max(plan.num_real_props, 1) / max(per_dive_bytes, 1)
    utilization = deds_per_s / ceiling_deds
    log(f"steady state: {nodes1 - nodes0} nodes in {dt:.1f}s "
        f"({nodes_per_s:.0f} nodes/s), best_bound={bb} "
        f"(reached @{time_to_bound:.1f}s), fixpoint_iters={fpit}, "
        f"deductions={deds:.3g} ({deds_per_s:.3g}/s; HBM-roofline "
        f"ceiling {ceiling_deds:.3g}/s -> {100*utilization:.1f}% of "
        f"speed-of-light)")

    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    vs = 1.0
    extra = {}
    if os.path.exists(baseline_path):
        try:
            base = json.load(open(baseline_path))
            if base.get("value"):
                vs = nodes_per_s / float(base["value"])
            # Bound-progress comparison: nodes/s alone is phase- and
            # cap-sensitive (a weaker per-step fixpoint inflates nodes
            # while slowing real optimization). Report how fast this
            # run reaches the baseline run's END bound on the same
            # instance/window — the honest "are we actually faster"
            # number.
            bb_base = base.get("best_bound_at_end")
            if bb_base is not None:
                t_hit = next((t for t, b in trajectory if b <= bb_base),
                             None)
                extra["baseline_best_bound_at_end"] = bb_base
                extra["time_to_baseline_bound_s"] = (
                    round(t_hit, 1) if t_hit is not None else None)
                if t_hit and base.get("measure_window_s"):
                    extra["bound_progress_speedup_vs_baseline"] = round(
                        float(base["measure_window_s"]) / t_hit, 2)
            if base.get("deductions_per_s"):
                extra["deductions_vs_baseline"] = round(
                    deds_per_s / float(base["deductions_per_s"]), 3)
        except Exception:
            pass
    inst_name = os.path.splitext(os.path.basename(INSTANCE))[0]
    inst_name = inst_name.replace("example_", "")
    out = {
        "metric": f"{inst_name} nodes/s ({DIVES} dives, 1 chip)",
        "value": round(nodes_per_s, 1),
        "unit": "nodes/s",
        "vs_baseline": round(vs, 3),
        "fp_cap": best_cap,
        "fp_layout": solver.cfg.fp_layout,
        "use_table": bool(solver.use_table),
        "deductions_per_s": round(deds_per_s, 1),
        "best_bound_at_end": bb,
        "measure_window_s": round(dt, 1),
        "time_to_bound_s": round(time_to_bound, 1),
        "bound_trajectory": trajectory[:64],
        "hbm_roofline_deds_per_s": round(ceiling_deds, 1),
        "roofline_utilization": round(utilization, 4),
        **extra,
    }
    if backend_mode != "default":
        out["invalid_for_perf"] = True
        out["note"] = ("CPU-platform fallback (TPU tunnel unavailable); "
                       "not comparable to TPU baseline")
        # Preserve the last known TPU measurement so the round's perf
        # record is never just a meaningless CPU number.
        try:
            base = json.load(open(baseline_path))
            out["last_known_tpu"] = {
                "value": base.get("value"),
                "metric": base.get("metric"),
                "recorded": base.get("recorded", "round 1"),
            }
        except Exception:
            pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
