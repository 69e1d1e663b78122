"""Persistent XLA compilation cache setup.

Compiles are expensive in this environment (~0.4-2s per primitive on CPU,
20-40s per TPU program).  Every entry point (tests, CLI, bench) calls
``enable_persistent_cache()`` so compiled executables are reused across
processes.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")

_DONE = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    path = path or os.environ.get("SE3_ICP_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    # silence the cpu_aot_loader machine-feature chatter on cache hits
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _DONE = True
