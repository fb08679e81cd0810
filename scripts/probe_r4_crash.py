"""Bisect the TPU worker crash on the canonical scene headline config.

Steps through (spp, bounces, batch) combos on the mesh+analytic scene,
printing one line per step BEFORE running so the crash point is visible.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_cfg(eng, spp, b, batch, width=1920, height=1088):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.runtime.engine import _render_pipeline, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config

    cfg = make_config(eng._scene, width, height, samples_per_pixel=spp,
                      max_bounces=b, enable_denoiser=False)
    backend = _pick_backend(eng._flat, cfg)
    flat = eng._flat

    def run(scene, start):
        def step(_, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, rays, _g, _st, _d = _render_pipeline(
                s_i, cfg, backend, None, False)
            return None, (jnp.sum(rgba.astype(jnp.uint32)), rays)

        _, (cks, rays) = jax.lax.scan(step, None, start + jnp.arange(batch))
        return jnp.sum(cks), jnp.sum(rays)

    f = jax.jit(run)
    t0 = time.perf_counter()
    cks, rays = f(flat, jnp.int32(0))
    float(np.asarray(cks))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    cks, rays = f(flat, jnp.int32(batch))
    float(np.asarray(cks))
    dt = (time.perf_counter() - t0) / batch
    print(f"OK spp={spp} b={b} batch={batch} backend={backend} "
          f"compile={compile_s:.0f}s frame={dt*1e3:.1f}ms", flush=True)


def main():
    from raytracevs_tpu.runtime.engine import Engine

    eng = Engine(1920, 1088)
    eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    print("scene spp", eng._cfg.samples_per_pixel, "b", eng._cfg.max_bounces,
          "tris", int(eng._flat.mesh.mk_num_tris), flush=True)
    for spp, b, batch in [(1, 5, 1), (1, 10, 1), (12, 10, 1), (12, 10, 8)]:
        print(f"RUN spp={spp} b={b} batch={batch}", flush=True)
        run_cfg(eng, spp, b, batch)


if __name__ == "__main__":
    main()
