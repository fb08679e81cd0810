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


def resolve_cache_dir(start_dir: Optional[str] = None) -> str:
    """Three-tier cache-path resolution, mirroring the reference's shader
    path config (shader_config.ini searched up to 6 directory levels, then
    autodetect, then env var; DXRPipeline.cpp:191-342):

    1. `rtvs_config.ini` with `jitCachePath=` searched up to 6 levels up
       from `start_dir` (default: cwd),
    2. the `RAYTRACEVS_TPU_CACHE` environment variable,
    3. ~/.raytracevs_tpu/jit_cache.
    """
    d = os.path.abspath(start_dir or os.getcwd())
    for _ in range(6):
        ini = os.path.join(d, "rtvs_config.ini")
        if os.path.isfile(ini):
            try:
                with open(ini) as f:
                    for line in f:
                        line = line.strip()
                        if line.startswith("jitCachePath="):
                            val = line.split("=", 1)[1].strip()
                            if val:
                                return os.path.expanduser(val)
            except OSError:
                pass
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent
    env = os.environ.get("RAYTRACEVS_TPU_CACHE")
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".raytracevs_tpu", "jit_cache")


def enable_compilation_cache(directory: Optional[str] = None, min_compile_time: float = 1.0):
    """Turn on the persistent compilation cache.

    Call before the first jit execution. Returns the cache directory.
    """
    import jax

    directory = directory or resolve_cache_dir()
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return directory
