"""Round-4 session-3 checkpoint probe: quantify the session-2 kernel wins
(shadow blocked-seed, fused thickness, count-based shadow walk) across the
standalone wine-glass scene (VERDICT #6 target: >130 Mrays/s), the canonical
fast config (session-2 exit: 142.2 ms), and the canonical headline config
(VERDICT #3 target: >=10% down from 10716 ms).

One process, batched scans, floor-subtracted — the bench.py contract.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config

    out = {}

    # 1) standalone wine glass, glass + opaque (bench contract configs)
    for material in ("glass", "opaque"):
        eng = bench._mesh_engine(1920, 1088, material=material)
        cfg = eng._cfg
        backend = _pick_backend(eng._flat, cfg)
        s, rays, meta = bench._bench_config(eng, cfg, backend, reps=3, batch=8)
        out[f"mesh_{material}_ms"] = round(s * 1e3, 2)
        out[f"mesh_{material}_mrays"] = round(rays / s / 1e6, 1)
        out[f"mesh_{material}_meta"] = meta
        print(json.dumps({k: out[k] for k in out if material in k}),
              flush=True)

    # 2) canonical scene fast config (spp1 b5, denoiser off) — session-2
    #    exit measured 142.2 ms at batch 4
    eng = Engine(1920, 1088)
    eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    eng.update_scene(eng._scene, samples_per_pixel=1, max_bounces=5,
                     enable_denoiser=False)
    cfg = eng._cfg
    backend = _pick_backend(eng._flat, cfg)
    s, rays, meta = bench._bench_config(eng, cfg, backend, reps=3, batch=8)
    out["canon_fast_ms"] = round(s * 1e3, 2)
    out["canon_fast_mrays"] = round(rays / s / 1e6, 1)
    print(json.dumps({k: out[k] for k in out if "canon_fast" in k}),
          flush=True)

    # 3) canonical headline (scene-carried settings: spp16->12 clamp, b10),
    #    denoiser off for render-only continuity with the 10716 ms r4 bench
    eng2 = Engine(1920, 1088)
    eng2.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    eng2.update_scene(eng2._scene, enable_denoiser=False)
    cfg2 = eng2._cfg
    backend2 = _pick_backend(eng2._flat, cfg2)
    s, rays, meta = bench._bench_config(eng2, cfg2, backend2, reps=2, batch=2)
    out["headline_ms"] = round(s * 1e3, 1)
    out["headline_mrays"] = round(rays / s / 1e6, 2)
    out["headline_meta"] = meta
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
