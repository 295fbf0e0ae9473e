"""Sequential propagate-and-search oracle (the "cpu" architecture).

Mirrors the reference's CPU solver (cpu_solving.hpp:8-50): Gauss-
Seidel-style AC-1 fixpoint, entailment-based solution detection
(a node is a solution when every propagator is entailed, with the
objective value read as lb(obj) — barebones_dive_and_solve.hpp:992-1009),
branch-and-bound by tightening ub(obj) to best-1 at each node, and
DFS with left-child-first exploration matching the reference's
LightBranch child ordering (barebones_dive_and_solve.hpp:355-404).

Used both as a usable solver backend and as the semantics oracle that
the batched TPU engine is differentially tested against (SURVEY.md §4:
the reference's cpu-vs-gpu oracle pattern).
"""
from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import numpy as np

from ..core.ops import INF, NINF, NUM_OPS
from ..compile.tnf import Strategy, Tnf
from . import deduce_np


class PropTable:
    """Propagators grouped by op for vectorized deduction."""

    def __init__(self, tnf: Tnf):
        self.num_vars = tnf.num_vars
        order = np.argsort(tnf.ops, kind="stable")
        self.ops = tnf.ops[order]
        self.xs = tnf.xs[order].astype(np.int64)
        self.ys = tnf.ys[order].astype(np.int64)
        self.zs = tnf.zs[order].astype(np.int64)
        self.num_props = len(self.ops)
        self.groups: List[Tuple[int, slice]] = []
        for op in range(NUM_OPS):
            idx = np.nonzero(self.ops == op)[0]
            if len(idx):
                self.groups.append((op, slice(idx[0], idx[-1] + 1)))

    def propagate(self, lb: np.ndarray, ub: np.ndarray, max_iters: int = 100000):
        """AC-1 fixpoint in place. Returns (iterations, num_deductions, is_bot)."""
        iters = 0
        deds = 0
        while iters < max_iters:
            iters += 1
            changed = False
            for op, sl in self.groups:
                xs, ys, zs = self.xs[sl], self.ys[sl], self.zs[sl]
                cxl, cxu, cyl, cyu, czl, czu = deduce_np.deduce(
                    op, lb[xs], ub[xs], lb[ys], ub[ys], lb[zs], ub[zs])
                deds += len(xs)
                for ids, cl, cu in ((xs, cxl, cxu), (ys, cyl, cyu), (zs, czl, czu)):
                    old_l = lb[ids]
                    old_u = ub[ids]
                    np.maximum.at(lb, ids, cl)
                    np.minimum.at(ub, ids, cu)
                    if not changed:
                        if np.any(lb[ids] > old_l) or np.any(ub[ids] < old_u):
                            changed = True
            if np.any(lb > ub):
                return iters, deds, True
            if not changed:
                return iters, deds, False
        return iters, deds, bool(np.any(lb > ub))

    def all_entailed(self, lb: np.ndarray, ub: np.ndarray) -> bool:
        for op, sl in self.groups:
            xs, ys, zs = self.xs[sl], self.ys[sl], self.zs[sl]
            ok = deduce_np.ask(op, lb[xs], ub[xs], lb[ys], ub[ys], lb[zs], ub[zs])
            if not ok.all():
                return False
        return True


@dataclasses.dataclass
class SolveStats:
    nodes: int = 0
    fails: int = 0
    solutions: int = 0
    depth_max: int = 0
    fixpoint_iterations: int = 0
    num_deductions: int = 0
    exhaustive: bool = True
    solve_time: float = 0.0


@dataclasses.dataclass
class SolveResult:
    status: str  # "sat" | "unsat" | "unknown" | "optimal"
    objective: Optional[int]
    best_lb: Optional[np.ndarray]
    best_ub: Optional[np.ndarray]
    stats: SolveStats


def _splittable(lb, ub, ids=None):
    if ids is None:
        return (lb < ub) & (lb > NINF) & (ub < INF)
    return (lb[ids] < ub[ids]) & (lb[ids] > NINF) & (ub[ids] < INF)


def select_var(strategies: List[Strategy], lb, ub, start_strategy: int = 0):
    """Returns (strategy_index, var_id, val_order) or None if no
    splittable variable remains in any strategy."""
    for si in range(start_strategy, len(strategies)):
        s = strategies[si]
        ids = s.var_ids
        if ids is None:
            mask = _splittable(lb, ub)
            cand = np.nonzero(mask)[0]
            doms_l, doms_u = lb, ub
        else:
            mask = _splittable(lb, ub, ids)
            cand = np.nonzero(mask)[0]
            doms_l, doms_u = lb[ids], ub[ids]
        if len(cand) == 0:
            continue
        vo = s.var_order
        if vo == "input_order":
            pos = cand[0]
        elif vo == "first_fail":
            sizes = doms_u[cand] - doms_l[cand]
            pos = cand[np.argmin(sizes)]
        elif vo == "anti_first_fail":
            sizes = doms_u[cand] - doms_l[cand]
            pos = cand[np.argmax(sizes)]
        elif vo == "smallest":
            pos = cand[np.argmin(doms_l[cand])]
        elif vo == "largest":
            pos = cand[np.argmax(doms_u[cand])]
        else:
            pos = cand[0]
        var = int(pos) if ids is None else int(ids[pos])
        return si, var, s.val_order
    return None


def branch_children(val_order: str, lo: int, hi: int):
    """Two child intervals, left explored first (LightBranch semantics,
    barebones_dive_and_solve.hpp:355-384)."""
    if val_order == "indomain_min":
        return (lo, lo), (lo + 1, hi)
    if val_order == "indomain_max":
        return (hi, hi), (lo, hi - 1)
    if val_order == "indomain_split":
        mid = lo + (hi - lo) // 2
        return (lo, mid), (mid + 1, hi)
    if val_order == "indomain_reverse_split":
        mid = lo + (hi - lo) // 2
        return (mid + 1, hi), (lo, mid)
    return (lo, lo), (lo + 1, hi)


def solve(tnf: Tnf, timeout_s: float = 1e18, stop_after_n_solutions: int = 1,
          node_limit: int = 1 << 62, print_intermediate=None) -> SolveResult:
    """DFS branch-and-bound solve of a compiled TNF."""
    stats = SolveStats()
    t0 = time.monotonic()
    opt = tnf.obj_var >= 0

    if tnf.root_unsat:
        return SolveResult("unsat", None, None, None, stats)

    table = PropTable(tnf)
    lb = tnf.lb0.copy()
    ub = tnf.ub0.copy()

    best_bound = INF + 1
    best_lb = best_ub = None

    # Explicit DFS stack of unexplored nodes (domains snapshots).
    stack: List[Tuple[np.ndarray, np.ndarray, int]] = [(lb, ub, 0)]

    while stack:
        if time.monotonic() - t0 > timeout_s or stats.nodes >= node_limit:
            stats.exhaustive = False
            break
        lb, ub, depth = stack.pop()
        if opt and best_bound <= INF:
            # BAB: only accept strictly better solutions.
            ub[tnf.obj_var] = min(ub[tnf.obj_var], best_bound - 1)
        it, deds, bot = table.propagate(lb, ub)
        stats.nodes += 1
        stats.fixpoint_iterations += it
        stats.num_deductions += deds
        stats.depth_max = max(stats.depth_max, depth)
        if bot:
            stats.fails += 1
            continue
        if table.all_entailed(lb, ub):
            stats.solutions += 1
            best_lb, best_ub = lb.copy(), ub.copy()
            if opt:
                best_bound = int(lb[tnf.obj_var])
                if print_intermediate:
                    print_intermediate(best_lb, best_ub)
            else:
                if print_intermediate:
                    print_intermediate(best_lb, best_ub)
                if stop_after_n_solutions and stats.solutions >= stop_after_n_solutions:
                    stats.exhaustive = False
                    break
            continue
        sel = select_var(tnf.strategies, lb, ub)
        if sel is None:
            # Unsplittable (infinite domains remain): not exhaustive.
            stats.exhaustive = False
            continue
        _, var, val_order = sel
        (l0, u0), (l1, u1) = branch_children(val_order, int(lb[var]), int(ub[var]))
        rlb, rub = lb.copy(), ub.copy()
        rlb[var] = max(rlb[var], l1)
        rub[var] = min(rub[var], u1)
        stack.append((rlb, rub, depth + 1))
        lb[var] = max(lb[var], l0)
        ub[var] = min(ub[var], u0)
        stack.append((lb, ub, depth + 1))

    stats.solve_time = time.monotonic() - t0
    if stats.solutions == 0:
        status = "unsat" if stats.exhaustive else "unknown"
        return SolveResult(status, None, None, None, stats)
    if opt:
        status = "optimal" if stats.exhaustive else "sat"
        obj = int(best_lb[tnf.orig_obj_var]) if tnf.is_max else int(best_lb[tnf.obj_var])
        if tnf.is_max:
            # Original objective value: for maximization print ub of the
            # original variable (statistics.hpp:381-391 prints ub).
            obj = int(best_ub[tnf.orig_obj_var])
        return SolveResult(status, obj, best_lb, best_ub, stats)
    return SolveResult("sat", None, best_lb, best_ub, stats)
