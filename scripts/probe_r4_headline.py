"""Round-4 probe: canonical scene WITH the reconstructed WineGlass2.

1) Renders a 960x540 preview PNG (visual check vs /root/reference/ScreenShot.png).
2) Times the headline config (scene spp/bounces, denoiser off) floor-free.
3) Times the fast config (spp1 b5 denoiser on).

Writes /tmp/r4_headline.png and prints one JSON line.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4_headline.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def tunnel_floor(reps=6):
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda s: s + 1.0)
    x = jnp.float32(1.0)
    float(np.asarray(g(x)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(g(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(engine, cfg, backend, reps=4, batch=8):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import _render_pipeline

    state0 = (denoise_mod.init_state_auto(cfg.height, cfg.width, backend)
              if cfg.enable_denoiser else None)
    flat = engine._flat

    def run(scene, st, start):
        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, rays, _g, new_st, _d = _render_pipeline(
                s_i, cfg, backend, carry, False)
            return new_st, (jnp.sum(rgba.astype(jnp.uint32)), rays)

        st, (cks, rays) = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(cks), jnp.sum(rays), st

    f = jax.jit(run)
    cks, rays, st = f(flat, state0, jnp.int32(0))
    float(np.asarray(cks))
    floor = tunnel_floor()
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        cks, rays, st = f(flat, st, jnp.int32((r + 1) * batch))
        float(np.asarray(cks))
        times.append(time.perf_counter() - t0)
    best = min(times)
    if floor < 0.5 * best:
        best -= floor
    return best / batch, float(np.asarray(rays)) / batch


def main():
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config
    from raytracevs_tpu.io.png import write_png

    out = {}
    scene_path = "/root/reference/sample_scene.rtvs"

    # preview render (pallas) for the visual check
    eng = Engine(960, 544)
    eng.load_rtvs(scene_path, samples_per_pixel=4, max_bounces=8,
                  enable_denoiser=False)
    out["mesh_tris"] = (0 if eng._flat.mesh is None
                        else int(eng._flat.mesh.mk_num_tris))
    img = eng.render()
    write_png("/tmp/r4_headline.png", img)
    out["preview"] = "/tmp/r4_headline.png"

    # headline config timing
    eng2 = Engine(1920, 1088)
    eng2.load_rtvs(scene_path, enable_denoiser=False)
    backend = _pick_backend(eng2._flat, eng2._cfg)
    out["backend"] = backend
    out["spp"] = eng2._cfg.samples_per_pixel
    out["bounces"] = eng2._cfg.max_bounces
    s, rays = bench(eng2, eng2._cfg, backend)
    out["headline_ms"] = round(s * 1e3, 2)
    out["headline_mrays"] = round(rays / s / 1e6, 1)

    # fast config
    cfg_fast = make_config(eng2._scene, 1920, 1088, samples_per_pixel=1,
                           max_bounces=5, enable_denoiser=True)
    s, _ = bench(eng2, cfg_fast, backend)
    out["fast_ms"] = round(s * 1e3, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
