"""Cross-run checkpoint/resume of the batched search state.

The reference has no cross-run checkpointing (SURVEY.md §5: within-run
snapshot/restore only). Because this engine's entire search state is a
flat pytree of arrays (SearchState), saving and resuming a run is
nearly free — useful for preemptible TPU jobs and long proofs.
"""
from __future__ import annotations

import pickle
from typing import Optional

import jax
import numpy as np

from .engine import BatchedSolver, SearchState

FORMAT_VERSION = 2  # v2: SearchState gained ext_bound (multi-host)


def save_state(solver: BatchedSolver, st: SearchState, path: str,
               num_shards: int = 1):
    host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), st)
    payload = {
        "format": FORMAT_VERSION,
        "shape_signature": solver.plan.shape_signature,
        "num_dives": solver.cfg.num_dives,
        "max_depth": solver.cfg.max_depth,
        "num_shards": num_shards,
        "state": host._asdict(),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_state(solver: BatchedSolver, path: str, num_shards: int = 1,
               device_put=None) -> Optional[SearchState]:
    """Returns the restored device state, or None on any mismatch.

    `device_put` optionally places each leaf (used by the sharded
    solver to restore with the mesh sharding)."""
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if payload.get("format") != FORMAT_VERSION:
            return None
        if payload["shape_signature"] != solver.plan.shape_signature:
            return None
        if payload["num_dives"] != solver.cfg.num_dives or \
                payload["max_depth"] != solver.cfg.max_depth:
            return None
        if payload.get("num_shards", 1) != num_shards:
            return None
        import jax.numpy as jnp

        put = device_put or jnp.asarray
        return SearchState(**{k: put(np.asarray(v))
                              for k, v in payload["state"].items()})
    except Exception:
        return None
