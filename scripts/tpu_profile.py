#!/usr/bin/env python
"""Per-op TPU profile of the solve chunk (VERDICT r1 item 3).

Compiles the chunk program fresh (so optimized HLO text is available),
runs a few chunks under jax.profiler, and prints:
  - the measured FIXPOINT/SEARCH split,
  - the top ops by device time, annotated with their HLO op_name scope
    (which propagator family they belong to).

One TPU process at a time: run only when the chip is free.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default=os.path.join(
        "/root/reference/benchmarks", "example_wordpress7_500.fzn"))
    ap.add_argument("--dives", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--fp-cap", type=int, default=16)
    ap.add_argument("--fp-mode", default="fixpoint",
                    choices=["fixpoint", "wac1", "fixed"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    from turbo_tpu.compile.model import compile_model
    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.solver.engine import BatchedSolver, EngineConfig
    from turbo_tpu.solver.profile_split import hlo_scope_sets, _SUFFIX_RE

    print(f"% devices: {jax.devices()}", flush=True)
    tnf = compile_model(parse_fzn(args.instance))
    solver = BatchedSolver(tnf, EngineConfig(
        num_dives=args.dives, subproblems_power=14, max_depth=256,
        fp_max_iters=args.fp_cap, fp_mode=args.fp_mode))
    st = solver.init_state()
    t0 = time.monotonic()
    step_n = solver.make_step_n(args.chunk)
    st = step_n(st)
    jax.block_until_ready(st.phase)
    print(f"% compile+first chunk: {time.monotonic()-t0:.1f}s", flush=True)
    hlo = solver.step_hlo_text(args.chunk)
    if hlo is None:
        print("% no HLO text available; aborting", flush=True)
        return 1
    inside, outside, base_class = hlo_scope_sets(hlo)

    # Scope lookup: instruction name -> full op_name metadata.
    opname = {}
    pat = re.compile(r'^\s*(?:ROOT\s+)?%?([A-Za-z0-9_.\-]+)\s*=.*'
                    r'metadata=\{[^}]*op_name="([^"]+)"')
    for line in hlo.splitlines():
        m = pat.match(line)
        if m:
            opname[m.group(1)] = m.group(2)

    d = tempfile.mkdtemp(prefix="tpu_prof_")
    with jax.profiler.trace(d):
        for _ in range(args.reps):
            st = step_n(st)
            jax.block_until_ready(st.phase)

    from jax.profiler import ProfileData
    from turbo_tpu.solver.profile_split import event_instr_name
    print(f"% trace dir: {d} (analyze offline with "
          f"scripts/analyze_trace.py)", flush=True)
    dur = collections.Counter()
    for f in glob.glob(d + "/**/*.xplane.pb", recursive=True):
        pd = ProfileData.from_file(f)
        for plane in pd.planes:
            is_dev = plane.name.startswith("/device:")
            is_cpu = "CPU" in plane.name
            if not (is_dev or is_cpu):
                continue
            for line in plane.lines:
                if is_cpu and not line.name.startswith("tf_"):
                    continue
                if is_dev and line.name != "XLA Ops":
                    continue  # module/async lines double-count
                for e in line.events:
                    if e.duration_ns > 0:
                        dur[event_instr_name(e.name)] += e.duration_ns

    total = sum(dur.values())
    fix = other = 0
    for name, ns in dur.items():
        cls = (True if name in inside else False if name in outside
               else base_class.get(_SUFFIX_RE.sub("", name)))
        if cls is True:
            fix += ns
        elif cls is False:
            other += ns
    att = fix + other
    print(f"% total device ns={total} attributable={att} "
          f"({100.0*att/max(total,1):.1f}%)")
    if att:
        print(f"% fixpoint_frac={fix/att:.4f}")
    print(f"% top {args.top} ops by device time:")
    for name, ns in dur.most_common(args.top):
        meta = opname.get(name, "")
        scope = meta.split("/fixpoint/")[-1] if "/fixpoint/" in meta \
            else meta.rsplit("/", 1)[-1]
        print(f"  {ns/1e6:10.2f} ms  {100.0*ns/max(total,1):5.1f}%  "
              f"{name[:60]:60s}  {scope[:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
