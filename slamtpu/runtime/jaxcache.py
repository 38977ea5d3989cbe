"""Persistent XLA compilation cache.

Compiles are pathologically slow in this environment (sort-heavy map-build
graphs: tens of seconds to minutes, BENCH_NOTES.md) and nothing persists them
across processes by default — every app/bench/driver invocation repaid the
full cost. Entry points call :func:`enable_persistent_cache` before the first
jit so warm runs load compiled executables from disk instead.
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger("slamtpu.jaxcache")

_DEFAULT_DIR = os.path.expanduser("~/.cache/slamtpu-xla")


def enable_persistent_cache(path: str | None = None) -> None:
    """Idempotent; safe to call from every entry point before the first jit."""
    import jax

    path = path or os.environ.get("SLAMTPU_XLA_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config names vary across jax
        log.warning("persistent compilation cache unavailable: %s", e)
