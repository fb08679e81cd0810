#!/usr/bin/env python
"""Benchmark: sample_scene.rtvs at 1080p on the available accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference RayTraceVS sustains 30-60 FPS at 1080p on an RTX
3060 with ~2-4 traced rays/pixel ~= 125-500 Mrays/s (README.md:305, see
BASELINE.md); the north-star target is >=200 Mrays/s per TPU v5e chip
(BASELINE.json). vs_baseline is measured Mrays/s divided by 200.
"""
import json
import os
import sys
import time

BASELINE_MRAYS = 200.0
SCENE = os.environ.get("BENCH_SCENE", "/root/reference/sample_scene.rtvs")


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 4))

    from raytracevs_tpu.runtime.engine import Engine

    engine = Engine(width, height)
    engine.load_rtvs(SCENE)

    # Warmup (compile + tunnel warm-up)
    engine.render()

    times = []
    rays = []
    for _ in range(frames):
        start = time.perf_counter()
        engine.render()
        times.append(time.perf_counter() - start)
        rays.append(engine.last_rays)

    best_s = min(times)
    mean_rays = sum(rays) / len(rays)
    mrays = mean_rays / best_s / 1e6

    result = {
        "metric": f"Mrays/s/chip on sample_scene.rtvs @{width}x{height}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "frame_ms": round(best_s * 1000.0, 2),
        "rays_per_frame": int(mean_rays),
        "spp": engine._cfg.samples_per_pixel,
        "max_bounces": engine._cfg.max_bounces,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
