#!/usr/bin/env python
"""Offline per-op analysis of a jax.profiler trace + optimized-HLO sidecar.

Usage:
  python scripts/analyze_trace.py TRACE_DIR HLO_FILE [--top 30]

Aggregates device time from the "XLA Ops" line of the device plane,
maps each instruction to its HLO op_name scope (which propagator family
/ engine phase it came from), and prints:
  - total device time and the FIXPOINT/SEARCH split,
  - top ops by device time with their scope,
  - time grouped by scope component (element / linear / member / groups
    / select / branch ...).

Runs entirely offline - no TPU needed once the trace exists.
"""
from __future__ import annotations

import argparse
import collections
import glob
import re
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from turbo_tpu.solver.profile_split import (  # noqa: E402
    hlo_scope_sets, event_instr_name, _SUFFIX_RE, _OPNAME_RE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("hlo_file")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from jax.profiler import ProfileData

    with open(args.hlo_file) as f:
        hlo = f.read()
    inside, outside, base_class = hlo_scope_sets(hlo)

    opname = {}
    for line in hlo.splitlines():
        m = _OPNAME_RE.match(line)
        if m:
            opname[m.group(1)] = m.group(2)

    dur = collections.Counter()
    async_dur = collections.Counter()
    for f in glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True):
        pd = ProfileData.from_file(f)
        for plane in pd.planes:
            if not plane.name.startswith("/device:"):
                continue
            for line in plane.lines:
                tgt = (dur if line.name == "XLA Ops"
                       else async_dur if line.name == "Async XLA Ops"
                       else None)
                if tgt is None:
                    continue
                for e in line.events:
                    if e.duration_ns > 0:
                        tgt[event_instr_name(e.name)] += e.duration_ns

    total = sum(dur.values())
    fix = other = unatt = 0
    for name, ns in dur.items():
        cls = (True if name in inside else False if name in outside
               else base_class.get(_SUFFIX_RE.sub("", name)))
        if cls is True:
            fix += ns
        elif cls is False:
            other += ns
        else:
            unatt += ns
    print(f"total device time  : {total/1e6:.2f} ms "
          f"(+ {sum(async_dur.values())/1e6:.2f} ms async/overlapped)")
    print(f"fixpoint           : {fix/1e6:.2f} ms ({100.0*fix/max(total,1):.1f}%)")
    print(f"search/other       : {other/1e6:.2f} ms ({100.0*other/max(total,1):.1f}%)")
    print(f"unattributed       : {unatt/1e6:.2f} ms ({100.0*unatt/max(total,1):.1f}%)")

    def scope_of(name):
        meta = opname.get(name) or opname.get(_SUFFIX_RE.sub("", name), "")
        return meta

    # Group by trailing scope path component sequence (drop the jit()/ prefix).
    by_scope = collections.Counter()
    for name, ns in dur.items():
        meta = scope_of(name)
        if meta:
            # keep the named_scope path, strip the op leaf
            parts = meta.split("/")
            # find segment after jit(...) wrappers
            segs = [p for p in parts if not p.startswith("jit(")]
            key = "/".join(segs[:-1]) or segs[-1]
        else:
            key = "<no-metadata>"
        by_scope[key] += ns
    print(f"\ntime by scope (top {args.top}):")
    for key, ns in by_scope.most_common(args.top):
        print(f"  {ns/1e6:10.2f} ms  {100.0*ns/max(total,1):5.1f}%  {key[:110]}")

    print(f"\ntop {args.top} individual ops:")
    for name, ns in dur.most_common(args.top):
        meta = scope_of(name)
        print(f"  {ns/1e6:10.2f} ms  {100.0*ns/max(total,1):5.1f}%  "
              f"{name[:44]:44s}  {meta[-70:]}")

    print(f"\ntop 10 async (overlapped) ops:")
    for name, ns in async_dur.most_common(10):
        print(f"  {ns/1e6:10.2f} ms  {name[:60]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
