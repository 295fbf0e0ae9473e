#!/usr/bin/env python
"""Warm the executable cache for every golden-regression instance.

The reference's 60 s regression budget covers solveTime, not initTime
(statistics.hpp:345-346); on this TPU toolchain a cold XLA compile
takes minutes per program, so the 33-instance sweep must hit the disk
executable cache (solver/exec_cache.py). This script builds each
golden's solver through the SAME construction path the regression
runner uses (scripts/regression.py make_solver) and compiles + runs
one chunk, persisting the executable. Idempotent: cached instances
cost ~seconds (alias load + one chunk).

Run it alone — only one process may hold the TPU:
  nohup python scripts/warm_goldens.py > /tmp/warm_goldens.log 2>&1 &
"""
from __future__ import annotations

import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LIST = os.environ.get("GOLDEN_LIST",
                      "/root/reference/benchmarks/test_list.csv")
ARCH = os.environ.get("WARM_ARCH", "tpu")
OR_NODES = int(os.environ.get("WARM_OR", "0"))
CHUNK = int(os.environ.get("WARM_CHUNK", "64"))  # match regression --chunk
# Set to warm the regression's --disable-simplify leg (different plan
# shapes => different programs than the simplified ones).
DISABLE_SIMPLIFY = bool(int(os.environ.get("WARM_DISABLE_SIMPLIFY", "0")))


def main():
    t_all = time.monotonic()
    import jax
    if os.environ.get("WARM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["WARM_PLATFORM"])

    from turbo_tpu.frontend.fzn import parse_fzn
    from turbo_tpu.frontend.xcsp3 import parse_xcsp3
    from turbo_tpu.compile.model import compile_model
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from regression import make_solver

    print(f"devices: {jax.devices()}", flush=True)
    base = os.environ.get("GOLDEN_BASE",
                          os.path.dirname(os.path.dirname(LIST)))
    rows = list(csv.reader(open(LIST)))
    for path, _exp in rows:
        full = os.path.join(base, path)
        name = os.path.basename(path)
        t0 = time.monotonic()
        try:
            model = (parse_xcsp3(full) if full.endswith(".xml")
                     else parse_fzn(full))
            tnf = compile_model(model)
            s = make_solver(tnf, ARCH, OR_NODES, DISABLE_SIMPLIFY)
            if s.plan.root_unsat:
                print(f"SKIP {name:34s} root-unsat (no device program)",
                      flush=True)
                continue
            ta = time.monotonic()
            st = s.init_state()
            tb = time.monotonic()
            step_n = s.make_step_n(CHUNK)
            t1 = time.monotonic()
            st = step_n(st)
            # A real fetch proves the program is loaded and ran (the
            # relay returns from block_until_ready early on
            # deserialized executables).
            jax.device_get(st.phase)
            cfg = s.cfg if hasattr(s, "cfg") else s.solver.cfg
            print(f"WARM {name:34s} host={ta-t0:5.1f}s "
                  f"init={tb-ta:6.1f}s step_compile={t1-tb:6.1f}s "
                  f"chunk={time.monotonic()-t1:5.1f}s "
                  f"D={cfg.num_dives} depth={cfg.max_depth}", flush=True)
        except Exception as e:
            print(f"ERR  {name:34s} {type(e).__name__}: {e}", flush=True)
    print(f"total {time.monotonic()-t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
