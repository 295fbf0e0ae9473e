"""Host-side device plan: TNF -> static arrays for the batched TPU engine.

This plays the role of the reference's root preprocessing + memory
configuration (common_solving.hpp:520-585 root fixpoint / entailed-
constraint elimination, memory_gpu.hpp MemoryConfig):

* runs the root propagation fixpoint once on the host (numpy),
* drops propagators that are already entailed at the root,
* permutes variables so that (a) root-singleton variables (constants,
  fixed vars) sit at the tail and are excluded from the incidence
  structure, and (b) active variables are grouped into power-of-two
  degree buckets, giving the propagation kernel contiguous
  gather+reduce segments instead of scatters — the TPU-first
  replacement for the GPU's atomic scatter updates.

The propagation engine then works entirely in permuted ids; results
are mapped back through ``inv_perm`` for output.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..core.ops import INF, NINF, NUM_OPS
from ..compile.tnf import Strategy, Tnf
from . import deduce_np
from .oracle import PropTable


@dataclasses.dataclass
class PlanStrategy:
    var_order: str
    val_order: str
    # Permuted variable ids to consider, in tie-break order. For the
    # default whole-store strategy this is all active vars in permuted
    # order (reference: store order, barebones input_order_split).
    ids: np.ndarray


@dataclasses.dataclass
class Bucket:
    start: int            # first permuted var id in this bucket
    count: int
    cand_idx: np.ndarray  # (count, K) int32 indices into the flat candidate array


@dataclasses.dataclass
class Plan:
    V: int                # total vars (permuted)
    n_active: int         # vars that can change (non-root-singleton)
    P: int                # live propagators
    lb0: np.ndarray       # (V,) int32 root bounds after root fixpoint (permuted)
    ub0: np.ndarray
    groups: List[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]  # (op, xs, ys, zs)
    buckets: List[Bucket]
    obj: int              # permuted objective var id (-1 = satisfaction)
    strategies: List[PlanStrategy]
    inv_perm: np.ndarray  # permuted id -> original tnf id
    perm: np.ndarray      # original tnf id -> permuted id
    root_unsat: bool
    root_entailed: bool   # all propagators entailed at root


def build_plan(tnf: Tnf, max_bucket_k: int = 64) -> Plan:
    V = tnf.num_vars
    lb = tnf.lb0.copy()
    ub = tnf.ub0.copy()
    root_unsat = bool(tnf.root_unsat or np.any(lb > ub))

    # Root fixpoint on the host (preprocess, common_solving.hpp:541-563).
    table = PropTable(tnf)
    if not root_unsat and tnf.num_props:
        _, _, bot = table.propagate(lb, ub)
        root_unsat = root_unsat or bot
    if root_unsat:
        lb, ub = tnf.lb0.copy(), tnf.ub0.copy()

    # Drop root-entailed propagators (ask is monotone: once entailed,
    # always entailed), including fully-singleton satisfied ones.
    keep_groups = []
    for op, sl in table.groups:
        xs, ys, zs = table.xs[sl], table.ys[sl], table.zs[sl]
        if root_unsat:
            keep = np.ones(len(xs), dtype=bool)
        else:
            keep = ~deduce_np.ask(op, lb[xs], ub[xs], lb[ys], ub[ys], lb[zs], ub[zs])
        if keep.any():
            keep_groups.append((op, xs[keep], ys[keep], zs[keep]))
    P = sum(len(g[1]) for g in keep_groups)
    root_entailed = (P == 0)

    # Degree of each variable over live props, excluding root singletons.
    singleton = lb == ub
    deg = np.zeros(V, dtype=np.int64)
    for op, xs, ys, zs in keep_groups:
        for ids in (xs, ys, zs):
            np.add.at(deg, ids, 1)
    active = (~singleton) & (deg > 0)
    # Vars that are non-singleton but unconstrained still need branching;
    # they are "active" for the store but have no incidences.
    active |= ~singleton

    # Bucket sizes: powers of two up to max_bucket_k; larger degrees are
    # chained via virtual reduction slots below.
    Ks = []
    k = 4
    while k < max_bucket_k:
        Ks.append(k)
        k *= 2
    Ks.append(max_bucket_k)

    def bucket_of(d):
        for K in Ks:
            if d <= K:
                return K
        return Ks[-1]

    # Permutation: active vars sorted by bucket then original id, then
    # singletons.
    act_ids = np.nonzero(active)[0]
    buckets_of = np.array([bucket_of(int(deg[v])) for v in act_ids])
    order = np.lexsort((act_ids, buckets_of))
    act_sorted = act_ids[order]
    sing_ids = np.nonzero(~active)[0]
    inv_perm = np.concatenate([act_sorted, sing_ids]).astype(np.int64)
    perm = np.empty(V, dtype=np.int64)
    perm[inv_perm] = np.arange(V)
    n_active = len(act_sorted)

    lb_p = lb[inv_perm].astype(np.int32)
    ub_p = ub[inv_perm].astype(np.int32)

    # Remap propagators to permuted ids; candidate layout is
    # concatenated group order, 3 slots per prop (x,y,z), plus one
    # trailing neutral slot.
    groups = []
    base = 0
    slot_of: List[Tuple[np.ndarray, np.ndarray]] = []  # (var ids, slot ids)
    for op, xs, ys, zs in keep_groups:
        pxs = perm[xs].astype(np.int32)
        pys = perm[ys].astype(np.int32)
        pzs = perm[zs].astype(np.int32)
        groups.append((op, pxs, pys, pzs))
        n = len(pxs)
        idx = np.arange(n, dtype=np.int64)
        slot_of.append((pxs, (base + idx) * 3 + 0))
        slot_of.append((pys, (base + idx) * 3 + 1))
        slot_of.append((pzs, (base + idx) * 3 + 2))
        base += n
    neutral = 3 * P  # candidate slot holding (-INF, +INF)

    # Incidence lists per active permuted var.
    inc: List[List[int]] = [[] for _ in range(n_active)]
    for vids, slots in slot_of:
        for v, s in zip(vids.tolist(), slots.tolist()):
            if v < n_active:
                inc[v].append(s)

    # Build buckets over contiguous permuted ranges. Degrees above
    # max_bucket_k keep only the first slots... instead, spill extra
    # incidences into extra rows repeated via chained rounds: we simply
    # widen K for the last bucket to the true maximum to stay sound.
    buckets: List[Bucket] = []
    v = 0
    while v < n_active:
        K = bucket_of(len(inc[v]))
        end = v
        while end < n_active and bucket_of(len(inc[end])) == K:
            end += 1
        true_max = max((len(inc[i]) for i in range(v, end)), default=0)
        K = max(K, true_max)
        idx = np.full((end - v, K), neutral, dtype=np.int64)
        for i in range(v, end):
            row = inc[i]
            idx[i - v, :len(row)] = row
        buckets.append(Bucket(v, end - v, idx.astype(np.int32)))
        v = end

    # Objective + strategies in permuted ids.
    obj = int(perm[tnf.obj_var]) if tnf.obj_var >= 0 else -1
    strategies = []
    for s in tnf.strategies:
        if s.var_ids is None:
            ids = np.arange(n_active, dtype=np.int64)
            # Reference default-strategy tie-break order is store order;
            # ours is permuted order. Keep original order for
            # comparability: sort permuted ids by original id.
            ids = ids[np.argsort(inv_perm[:n_active], kind="stable")]
        else:
            ids = perm[s.var_ids]
        strategies.append(PlanStrategy(s.var_order, s.val_order, ids.astype(np.int32)))

    return Plan(V=V, n_active=n_active, P=P, lb0=lb_p, ub0=ub_p,
                groups=groups, buckets=buckets, obj=obj,
                strategies=strategies, inv_perm=inv_perm, perm=perm,
                root_unsat=root_unsat, root_entailed=root_entailed)
