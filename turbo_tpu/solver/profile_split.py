"""Measured FIXPOINT/SEARCH timer attribution (statistics.hpp:83-130).

The reference brackets its solve phases with per-block device clocks
(TIMEPOINT, barebones_dive_and_solve.hpp:615-618). Our step is one
fused XLA program, so instead:

  1. the engine wraps propagation in ``jax.named_scope("fixpoint")`` -
     every HLO instruction born there carries
     ``metadata={op_name=".../fixpoint/..."}`` through XLA's pipeline
     (fusions inherit a representative constituent's op_name);
  2. this module runs a few chunks under ``jax.profiler.trace``,
     aggregates per-op device durations from the xplane, and splits
     them by that scope marker.

The result is a *measured* fixpoint fraction of device time; the
regression fit in ``timers.PhaseTimers`` remains only as the fallback
when profiling is unavailable (e.g. a deserialized executable without
HLO text, or a backend whose profiler exports no per-op events).

Empirical notes (CPU PJRT): executed-thunk events live on
``/host:CPU`` plane lines named ``tf_XLA*`` and carry ``hlo_op`` /
``hlo_module`` stats; runtime thunk names can drift from
``compiled.as_text()`` names by a numeric suffix (``dot_general.0`` in
text vs ``dot_general.1`` at runtime), so matching falls back from the
exact instruction name to its unsuffixed base when the base is
unambiguous (all same-base instructions on one side of the scope).
"""
from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile
from typing import Optional

_OPNAME_RE = re.compile(
    r'^\s*(?:ROOT\s+)?%?([A-Za-z0-9_.\-]+)\s*=.*'
    r'metadata=\{[^}]*op_name="([^"]+)"')

_SUFFIX_RE = re.compile(r'(?:\.\d+|_\d+)+$')


def event_instr_name(event_name: str) -> str:
    """Instruction name from a profiler event name.

    CPU PJRT emits bare names ("dot_general.1"); the TPU device plane
    emits the whole instruction text ("%fusion.3 = s32[256]{...} ...").
    Take the token before " = " (if any), then strip the "%" sigil and
    any trailing type annotation after ":".
    """
    head = event_name.split(" = ", 1)[0]
    return head.split(":")[0].strip().lstrip("%")


def enabled() -> bool:
    return os.environ.get("TURBO_TPU_PROFILE_SPLIT", "1") != "0"


def hlo_scope_sets(hlo_text: str, scope: str = "fixpoint"):
    """Partition HLO instruction names by whether their op_name carries
    `scope`. Scans all computations (while bodies included). Returns
    (inside, outside, base_class) where base_class maps an unsuffixed
    base name to True (all inside), False (all outside) or None
    (ambiguous)."""
    inside, outside = set(), set()
    for line in hlo_text.splitlines():
        m = _OPNAME_RE.match(line)
        if not m:
            continue
        name, op_name = m.group(1), m.group(2)
        is_fix = f"/{scope}" in op_name or op_name.startswith(scope)
        (inside if is_fix else outside).add(name)
    base_class = {}
    for name in inside:
        base_class[_SUFFIX_RE.sub("", name)] = True
    for name in outside:
        b = _SUFFIX_RE.sub("", name)
        base_class[b] = None if base_class.get(b) is True else False
    return inside, outside, base_class


def _classify(name: str, inside, outside, base_class) -> Optional[bool]:
    """True=fixpoint, False=other, None=unattributable."""
    if name in inside:
        return True
    if name in outside:
        return False
    return base_class.get(_SUFFIX_RE.sub("", name))


def measure_fixpoint_fraction(run_chunk, hlo_text: str,
                              reps: int = 2) -> Optional[float]:
    """Execute `run_chunk()` `reps` times under the profiler and return
    the device-time fraction spent in the "fixpoint" scope, or None
    when nothing attributable was captured."""
    import jax
    from jax.profiler import ProfileData

    inside, outside, base_class = hlo_scope_sets(hlo_text)
    if not inside:
        return None
    d = tempfile.mkdtemp(prefix="turbo_tpu_prof_")
    try:
        with jax.profiler.trace(d):
            for _ in range(reps):
                run_chunk()
        fix_ns = other_ns = 0
        for f in glob.glob(d + "/**/*.xplane.pb", recursive=True):
            pd = ProfileData.from_file(f)
            for plane in pd.planes:
                # Device planes on TPU/GPU; XLA executor lines on CPU.
                is_dev = plane.name.startswith("/device:")
                is_cpu = "CPU" in plane.name
                if not (is_dev or is_cpu):
                    continue
                for line in plane.lines:
                    if is_cpu and not line.name.startswith("tf_"):
                        continue  # python / compiler-pass lines
                    if is_dev and line.name not in ("XLA Ops",):
                        continue  # modules/async lines double-count
                    for e in line.events:
                        if e.duration_ns <= 0:
                            continue
                        name = event_instr_name(e.name)
                        cls = _classify(name, inside, outside, base_class)
                        if cls is True:
                            fix_ns += e.duration_ns
                        elif cls is False:
                            other_ns += e.duration_ns
        total = fix_ns + other_ns
        if total <= 0:
            return None
        return fix_ns / total
    except Exception:
        return None
    finally:
        shutil.rmtree(d, ignore_errors=True)
