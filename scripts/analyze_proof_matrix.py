#!/usr/bin/env python
"""Decide the golden-regression EPS config from a bench_proofs matrix.

Reads the proof-matrix JSONL (instance x subproblems_power x fp_cap,
produced by scripts/bench_proofs.py on the chip) and prints, per
instance, every configuration that PROVES optimality and its solve
time, sorted; then the single (sub, cap) pair that closes the most
instances within the 60 s reference budget (test_turbo.sh:27-76
semantics: solveTime, compile excluded).

  python scripts/analyze_proof_matrix.py /tmp/proof_matrix_r3.jsonl
"""
from __future__ import annotations

import collections
import json
import sys

BUDGET_S = 60.0


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/proof_matrix_r3.jsonl"
    rows = [json.loads(l) for l in open(path) if l.strip()]
    by_inst = collections.defaultdict(list)
    for r in rows:
        by_inst[r["instance"]].append(r)
    config_wins = collections.Counter()
    for inst, rs in sorted(by_inst.items()):
        print(f"\n{inst}:")
        for r in sorted(rs, key=lambda r: (r.get("solve_s") or 1e9)):
            cap = r.get("cap", 16) or 16  # pre-cap-sweep rows ran at 16
            if "error" in r:
                print(f"  sub={r['sub']} cap={cap} ERROR {r['error'][:80]}")
                continue
            proved = r["status"] == "optimal"
            mark = ("PROVED" if proved and r["solve_s"] <= BUDGET_S
                    else "proved>60s" if proved else "timeout")
            print(f"  sub={r['sub']:2d} cap={cap:3d} "
                  f"{mark:11s} obj={r['objective']} "
                  f"solve={r['solve_s']:6.1f}s nodes={r['nodes']:>9,} "
                  f"({r['nodes_per_s']:>8,.0f}/s) "
                  f"sub={r['solved_sub']}+{r['skipped_sub']}skip")
            if proved and r["solve_s"] <= BUDGET_S:
                config_wins[(r["sub"], cap)] += 1
    if config_wins:
        print("\nconfigs closing the most instances within 60s:")
        for (sub, cap), n in config_wins.most_common(5):
            print(f"  sub={sub} cap={cap}: {n} instances")
    else:
        print("\nno configuration proved any instance within the budget")


if __name__ == "__main__":
    main()
