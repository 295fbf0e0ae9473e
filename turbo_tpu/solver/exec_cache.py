"""Persistent compiled-executable cache.

The TPU toolchain in this environment compiles XLA programs very
slowly (minutes) and its own compilation cache is unreliable across
processes. PJRT executable serialization, however, works: a compiled
program deserializes and loads in well under a second. This module
caches serialized executables on disk keyed by

  (engine source hash, jax version, backend + device kind,
   program key: plan shape signature + engine config + chunk),

so each program shape is compiled once per machine, ever. Plays the
role the reference's ahead-of-time CUDA build plays (turbo compiles
its kernels once at build time; we compile once per model shape).
"""
from __future__ import annotations

import hashlib
import os
import pickle
import sys
from typing import Any, Callable, Optional

import jax

CACHE_DIR = os.environ.get(
    "TURBO_TPU_EXEC_CACHE",
    os.path.expanduser("~/.cache/turbo_tpu/executables"))

_code_hash = None


def _engine_code_hash() -> str:
    global _code_hash
    if _code_hash is None:
        h = hashlib.sha256()
        base = os.path.dirname(os.path.abspath(__file__))
        for mod in ("engine.py", "propagate_jax.py", "plan.py",
                    "exec_cache.py", "eps_table.py"):
            try:
                with open(os.path.join(base, mod), "rb") as f:
                    h.update(f.read())
            except OSError:
                pass
        _code_hash = h.hexdigest()[:16]
    return _code_hash


def _backend_key() -> str:
    try:
        dev = jax.devices()[0]
        return f"{dev.platform}:{dev.device_kind}:{len(jax.devices())}"
    except Exception:
        return "unknown"


def cache_key(program_key) -> str:
    payload = repr((jax.__version__, _engine_code_hash(), _backend_key(),
                    program_key))
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def cached_hlo_text(program_key) -> Optional[str]:
    """Optimized-HLO sidecar for a cached executable, or None."""
    pk = cache_key(program_key)
    try:
        target = open(os.path.join(CACHE_DIR, f"{pk}.alias")).read().strip()
        base = target[:-4] if target.endswith(".pkl") else target
        with open(os.path.join(CACHE_DIR, f"{base}.hlo")) as f:
            return f.read()
    except Exception:
        return None


def cached_compile(jitted: Callable, example_args: tuple,
                   program_key, verbose: bool = False) -> Callable:
    """Compile `jitted` for `example_args`, reusing a disk-cached
    serialized executable when available. Returns a callable taking the
    same (pytree) arguments. Falls back to plain jit on any error."""
    backend = None
    try:
        backend = jax.devices()[0].platform
    except Exception:
        pass
    if backend in (None, "cpu"):
        return jitted  # CPU compiles are fast; don't churn the disk.

    from jax.experimental import serialize_executable as se

    def _load(path, key):
        ser, in_tree, out_tree = pickle.loads(open(path, "rb").read())
        fn = se.deserialize_and_load(ser, in_tree, out_tree)
        if verbose:
            print(f"% loaded cached executable {key}", file=sys.stderr)
        return fn

    # Fast path: the (code hash, backend, program key) alias skips
    # tracing+lowering entirely — lowering the chunk program takes
    # minutes at real sizes, dwarfing the sub-second deserialize.
    pk = cache_key(program_key)
    alias = os.path.join(CACHE_DIR, f"{pk}.alias")
    if os.path.exists(alias):
        try:
            target = open(alias).read().strip()
            return _load(os.path.join(CACHE_DIR, target), f"{pk}->{target}")
        except Exception as e:
            if verbose:
                print(f"% executable alias load failed ({e}); relowering",
                      file=sys.stderr)

    # Key on the lowered program itself (plus backend): stable across
    # source edits that don't change the compiled computation.
    try:
        lowered = jitted.lower(*example_args)
        hlo = lowered.as_text()
        key = hashlib.sha256(
            (jax.__version__ + _backend_key() + hlo).encode()).hexdigest()[:32]
    except Exception:
        lowered = None
        key = pk
    path = os.path.join(CACHE_DIR, f"{key}.pkl")

    def _alias(key):
        try:
            os.makedirs(CACHE_DIR, exist_ok=True)
            tmp = alias + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(f"{key}.pkl")
            os.replace(tmp, alias)
        except Exception:
            pass

    if os.path.exists(path):
        try:
            fn = _load(path, key)
            _alias(key)
            return fn
        except Exception as e:
            if verbose:
                print(f"% executable cache load failed ({e}); recompiling",
                      file=sys.stderr)
    try:
        if lowered is None:
            lowered = jitted.lower(*example_args)
        compiled = lowered.compile()
        try:
            os.makedirs(CACHE_DIR, exist_ok=True)
            payload = se.serialize(compiled)
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(pickle.dumps(payload))
            os.replace(tmp, path)
            _alias(key)
            try:
                # Optimized-HLO sidecar: profile_split needs op_name
                # metadata, which deserialized executables can't
                # reproduce (no as_text); persist it at compile time.
                with open(os.path.join(CACHE_DIR, f"{key}.hlo"), "w") as f:
                    f.write(compiled.as_text())
            except Exception:
                pass
            if verbose:
                print(f"% cached executable {key}", file=sys.stderr)
        except Exception as e:
            if verbose:
                print(f"% executable cache store failed: {e}", file=sys.stderr)
        return compiled
    except Exception:
        return jitted
