"""Persistent XLA compilation cache.

ViT-L compiles take 1-4 minutes through this environment's remote-compile
path; the JAX persistent cache cuts warm starts to <1 s (measured 108.9 s
-> 0.4 s). Every CLI entry point calls :func:`enable_compilation_cache`
before the first trace.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "PAINTER_TPU_COMPILE_CACHE",
    os.path.expanduser("~/.cache/painter_tpu_xla"))


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[cache] compilation cache disabled: {e}")
