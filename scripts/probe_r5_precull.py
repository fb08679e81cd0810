"""Round-5 probe: root-AABB walk preculling (RTVS_MK_PRECULL) A/B on the
canonical scene (VERDICT r4 #1: attack walk ENTRIES, not entry cost).

Per-lane segment-vs-root-box tests outside every mesh walk let whole
tiles skip the walk via scalar lax.cond. Exact by construction, so the
win is pure — this probe measures it on:
  - canonical fast (spp1 b5 denoiser-off, r4 exit: 142.2 ms)
  - canonical headline (scene spp12 b10, r4 exit: 3165 ms)
  - standalone wine glass (regression check: rays start near the mesh,
    so precull should be ~neutral there)

One process, batched scans, floor-subtracted (bench.py contract).
Flags are flipped via megakernel module globals between engine builds —
fresh Engine => fresh trace => the global is re-read.
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
    for flag in (False, True):
        mk._PRECULL = flag
        # _render_pipeline is a module-level jit and jit-of-jit caches
        # traced jaxprs by avals — without clearing, the second flag
        # setting would silently reuse the first build's kernels
        jax.clear_caches()
        tag = "pre" if flag else "base"

        eng = canon_engine(spp=1, bounces=5)
        ms, mr = measure(eng, reps=3, batch=8)
        out[f"canon_fast_{tag}_ms"] = ms
        out[f"canon_fast_{tag}_mrays"] = mr
        print(json.dumps({k: v for k, v in out.items() if tag in k}),
              flush=True)

        eng = canon_engine()
        ms, mr = measure(eng, reps=2, batch=2)
        out[f"headline_{tag}_ms"] = ms
        out[f"headline_{tag}_mrays"] = mr
        print(json.dumps({k: v for k, v in out.items() if tag in k}),
              flush=True)

        eng = bench._mesh_engine(1920, 1088, material="glass")
        ms, mr = measure(eng, reps=3, batch=8)
        out[f"wineglass_{tag}_ms"] = ms
        out[f"wineglass_{tag}_mrays"] = mr
        print(json.dumps({k: v for k, v in out.items() if tag in k}),
              flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
