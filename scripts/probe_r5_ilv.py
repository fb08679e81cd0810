"""Round-5 probe: interleaved shadow walks (RTVS_MK_SHADOW_ILV) A/B on
the canonical scene. Mode 0 = sequential walks, 1 = dominant-light pair
interleaved per sample, 2 = one walk group across all samples x lights.

Hypothesis: the shadow component (64.7 ms of the 142 ms fast frame at
head, probe_r4_combo re-run) is bound by the pointer-chasing node-load
latency chain — entries (precull), descent (fat leaf), and leaf ops
(count walk) were each measured ~flat. Interleaving N independent walks
pipelines their loads; outputs are bit-identical by construction
(tests/test_shadow_fuse.py::test_interleaved_dual_walk_bit_identical).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from raytracevs_tpu.ops.pallas import megakernel as mk


def canon_engine(spp=None, bounces=None):
    from raytracevs_tpu.runtime.engine import Engine
    eng = Engine(1920, 1088)
    eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    kw = dict(enable_denoiser=False)
    if spp is not None:
        kw.update(samples_per_pixel=spp, max_bounces=bounces)
    eng.update_scene(eng._scene, **kw)
    return eng


def measure(eng, reps, batch):
    from raytracevs_tpu.runtime.engine import _pick_backend
    cfg = eng._cfg
    backend = _pick_backend(eng._flat, cfg)
    s, rays, meta = bench._bench_config(eng, cfg, backend, reps=reps,
                                        batch=batch)
    return round(s * 1e3, 2), round(rays / s / 1e6, 1)


def main():
    import jax

    out = {}
    for mode in (0, 1, 2):
        mk._SHADOW_ILV_MODE = mode
        mk._SHADOW_ILV = mode >= 1
        jax.clear_caches()

        eng = canon_engine(spp=1, bounces=5)
        ms, mr = measure(eng, reps=3, batch=8)
        out[f"fast_m{mode}_ms"] = ms
        out[f"fast_m{mode}_mrays"] = mr
        print(json.dumps({k: v for k, v in out.items()
                          if f"m{mode}" in k}), flush=True)
    # headline for the best mode (2) vs sequential
    for mode in (2, 0):
        mk._SHADOW_ILV_MODE = mode
        mk._SHADOW_ILV = mode >= 1
        jax.clear_caches()
        eng = canon_engine()
        ms, mr = measure(eng, reps=2, batch=2)
        out[f"headline_m{mode}_ms"] = ms
        out[f"headline_m{mode}_mrays"] = mr
        print(json.dumps({k: v for k, v in out.items()
                          if f"headline_m{mode}" in k}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
