#!/usr/bin/env python
"""Benchmark: sample_scene.rtvs at 1080p on the available accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference RayTraceVS sustains 30-60 FPS at 1080p on an RTX
3060 with ~2-4 traced rays/pixel ~= 125-500 Mrays/s (README.md:305, see
BASELINE.md); the north-star target is >=200 Mrays/s per TPU v5e chip
(BASELINE.json). vs_baseline is measured Mrays/s divided by 200.

Timing forces the COMPLETE frame pipeline (wavefront render + G-buffer
assembly + composite + RGBA8 conversion) by fetching an on-device checksum
of the final image — a scalar, so the measurement reflects chip compute,
not the development tunnel's host-transfer bandwidth. (In this dev
environment the TPU is reached through a socket tunnel whose ~5 MB/s
readback would otherwise dominate; production readback is PCIe.)
"""
import json
import os
import sys
import time

BASELINE_MRAYS = 200.0
SCENE = os.environ.get("BENCH_SCENE", "/root/reference/sample_scene.rtvs")


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1088))  # tile-aligned 1080p
    frames = int(os.environ.get("BENCH_FRAMES", 4))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import tonemap
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    engine = Engine(width, height)
    engine.load_rtvs(SCENE)
    flat = engine._flat
    cfg = engine._cfg
    backend = _pick_backend(flat)

    from raytracevs_tpu.ops.render import render_rows

    def frame(scene):
        out = render_rows(scene, cfg, jnp.int32(0), cfg.height, backend=backend)
        color01 = composite_mod.composite(
            out.gbuffer, out.raw_specular, scene.exposure, scene.tone_map_operator,
            scene.gamma, use_denoised=False,
        )
        rgba = tonemap.to_rgba8(color01)
        checksum = jnp.sum(rgba.astype(jnp.uint32))
        return checksum, out.rays

    f = jax.jit(frame)
    checksum, rays = f(flat)
    float(np.asarray(checksum))  # warmup: compile + tunnel

    times = []
    ray_counts = []
    for i in range(frames):
        fi = flat._replace(frame_index=jnp.asarray(i + 1, jnp.uint32))
        start = time.perf_counter()
        checksum, rays = f(fi)
        float(np.asarray(checksum))  # forces full-frame execution
        times.append(time.perf_counter() - start)
        ray_counts.append(float(np.asarray(rays)))

    best_s = min(times)
    mean_rays = sum(ray_counts) / len(ray_counts)
    mrays = mean_rays / best_s / 1e6

    result = {
        "metric": f"Mrays/s/chip on sample_scene.rtvs @{width}x{height}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "frame_ms": round(best_s * 1000.0, 2),
        "fps": round(1.0 / best_s, 2),
        "rays_per_frame": int(mean_rays),
        "spp": cfg.samples_per_pixel,
        "max_bounces": cfg.max_bounces,
        "backend": backend,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
