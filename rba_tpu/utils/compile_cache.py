"""Opt-in persistent XLA compilation cache for the perf/eval tools.

Fresh-process compiles through the TPU tunnel cost 1-5 min for inference
graphs and >15 min for the 3-level training backward (CLAUDE.md); every
tool invocation (devtime, trace_split, bench, sweep) pays it again because
jax's persistent compilation cache is off by default.  This helper turns it
on with tuned thresholds so the serialized executables are reused across
processes.

Call ``enable_compile_cache()`` BEFORE the first jit call.  The cache dir
defaults to ``$RBA_COMPILE_CACHE`` or ``~/.cache/rba_tpu/xla`` and is
created on demand.  Set ``RBA_COMPILE_CACHE=off`` to disable (e.g. when
timing cold-compile behavior itself).

Reference analogue: none (SURVEY.md §5 — the reference has no compile
cache; torch eager doesn't need one).
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir or None.

    Safe to call multiple times. Honors RBA_COMPILE_CACHE (a directory, or
    "off"/"0"/"" to disable).
    """
    env = os.environ.get("RBA_COMPILE_CACHE")
    if env is not None and env.strip().lower() in ("off", "0", ""):
        return None
    path = path or env or os.path.expanduser("~/.cache/rba_tpu/xla")
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the tunnel round-trip dominates, not XLA time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
