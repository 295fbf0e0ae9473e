"""Device-backend initialization with a watchdog.

The TPU relay in some environments can hang *indefinitely* inside
`jax.devices()` (dead tunnel, or another process holding the single
chip). The reference never faces this (CUDA init either works or
errors, memory_gpu.hpp:138-171), but a CLI that can sit forever with
no output is unacceptable for a MiniZinc backend — the probe runs in a
subprocess with a timeout and retries with backoff, then falls back to
the CPU platform with a loud warning instead of hanging.

Shared by the CLI (-platform flag / TURBO_TPU_PLATFORM env) and
bench/regression scripts.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

INIT_TIMEOUT_S = float(os.environ.get("TURBO_TPU_INIT_TIMEOUT_S", "120"))
INIT_ATTEMPTS = int(os.environ.get("TURBO_TPU_INIT_ATTEMPTS", "2"))
INIT_BACKOFF_S = float(os.environ.get("TURBO_TPU_INIT_BACKOFF_S", "20"))


def ensure_backend(platform: str = "", verbose: bool = False) -> str:
    """Initialize the JAX backend safely. Returns the platform in use.

    platform: explicit platform name ("cpu", "tpu", "axon", ...); empty
    uses the environment default. A non-cpu default is probed in a
    subprocess first so a dead relay can never hang the caller.
    """
    platform = platform or os.environ.get("TURBO_TPU_PLATFORM", "")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
        return platform
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return "cpu"
    # Injectable probe body (tests simulate a hung relay with a sleep).
    probe_code = os.environ.get("TURBO_TPU_INIT_PROBE_CODE",
                                "import jax; jax.devices()")
    for attempt in range(1, INIT_ATTEMPTS + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_code],
                timeout=INIT_TIMEOUT_S, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return "default"
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            print(f"% WARNING: device init probe {attempt}/{INIT_ATTEMPTS} "
                  f"failed ({type(e).__name__})", file=sys.stderr, flush=True)
            if attempt < INIT_ATTEMPTS:
                time.sleep(INIT_BACKOFF_S * attempt)
    print("% WARNING: accelerator backend unavailable; falling back to "
          "the CPU platform (results remain exact; performance does not)",
          file=sys.stderr, flush=True)
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"
