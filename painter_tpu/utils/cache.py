"""Persistent XLA compilation cache.

ViT-L compiles take 1-4 minutes through this environment's remote-compile
path; the JAX persistent cache cuts warm starts to <1 s (measured 108.9 s
-> 0.4 s). Every CLI entry point calls :func:`enable_compilation_cache`
before the first trace.

The default cache directory is namespaced by a host-CPU fingerprint:
XLA:CPU persists AOT executables whose target machine features must match
the executing host, but the JAX cache key does not include them — after a
host migration the cache serves executables built for the *old* CPU
(cpu_aot_loader warns "could lead to execution errors such as SIGILL").
Observed 2026-08-17: a migrated sandbox loaded stale avx10/amx-feature
AOT results and one rank of the 2-process distributed test died, failing
the other rank's Gloo rendezvous with DEADLINE_EXCEEDED. Remote-TPU cache
entries are host-independent but share the namespace; one cold compile
per host migration is the price of never executing mismatched AOT code.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Stable fingerprint of the executing CPU's feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine() or "unknown"


_CACHE_ROOT = os.path.expanduser("~/.cache/painter_tpu_xla")

DEFAULT_CACHE_DIR = os.environ.get(
    "PAINTER_TPU_COMPILE_CACHE",
    os.path.join(_CACHE_ROOT, _host_fingerprint()))


def _prune_legacy_entries(root: str) -> None:
    """Best-effort removal of pre-namespace cache files directly under
    the root (written by earlier versions; possibly built on another
    host, and never read again under the namespaced layout)."""
    try:
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.isfile(p):
                os.unlink(p)
    except OSError:
        pass


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        if os.path.dirname(cache_dir) == _CACHE_ROOT:
            _prune_legacy_entries(_CACHE_ROOT)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[cache] compilation cache disabled: {e}")
