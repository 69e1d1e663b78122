"""Persistent XLA compilation cache setup.

Compiles are expensive in this environment (~0.4-2s per primitive on CPU,
20-40s per TPU program).  Every entry point (tests, CLI, bench) calls
``enable_persistent_cache()`` so compiled executables are reused across
processes.

The cache directory is suffixed with a HOST FINGERPRINT (machine arch +
CPU feature flags): XLA:CPU's persistent cache key does not include the
host's CPU features, so a cache populated on one machine serves AOT
executables with unsupported instructions on another -- the loader
warns "+<feature> is not supported on the host machine ... could lead
to execution errors such as SIGILL", and we observed sporadic
futex-deadlocked test runs exactly when foreign entries were live.
One recompile per new host; correctness everywhere.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")

_DONE = False


def _host_fingerprint() -> str:
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += line
                    break
    except OSError:
        pass
    return hashlib.sha1(tag.encode()).hexdigest()[:10]


def enable_persistent_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    path = path or os.environ.get("SE3_ICP_TPU_CACHE_DIR", _DEFAULT_DIR)
    path = os.path.join(path, _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    # silence the cpu_aot_loader machine-feature chatter on cache hits
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _DONE = True
