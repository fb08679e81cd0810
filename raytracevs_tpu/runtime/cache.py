"""Persistent compilation cache setup (the shader cache analog).

The reference caches compiled shader bytecode keyed by driver version,
adapter LUID and source SHA-256 (ShaderCache.h:33-47); for jit programs the
equivalent is JAX's persistent compilation cache — keyed by backend,
program fingerprint and jaxlib version, so a process restart skips the
multi-second Mosaic/XLA compiles.
"""
from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(directory: Optional[str] = None, min_compile_time: float = 1.0):
    """Turn on the persistent compilation cache.

    Call before the first jit execution. Returns the cache directory.
    """
    import jax

    directory = directory or os.path.join(
        os.path.expanduser("~"), ".raytracevs_tpu", "jit_cache"
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return directory
