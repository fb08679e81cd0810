"""TPU probe: new hierarchical photon gather + BVH presplit on wine glass.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3a.py
"""
import os
import sys
import time

import numpy as np


def frame_time(engine, cfg, backend, reps=4, batch=4):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows

    flat = engine._flat

    def run(scene, start):
        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows(s_i, cfg, jnp.int32(0), cfg.height, backend=backend)
            return carry, (jnp.sum(out.color), out.rays)

        _, (cks, rays) = jax.lax.scan(step, 0, start + jnp.arange(batch))
        return jnp.sum(cks), jnp.sum(rays)

    f = jax.jit(run)
    cks, rays = f(flat, jnp.int32(0))
    float(np.asarray(cks))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        cks, rays = f(flat, jnp.int32(batch * (r + 1)))
        float(np.asarray(cks))
        ts.append(time.perf_counter() - t0)
    rpf = float(np.asarray(rays)) / batch
    best = min(ts) / batch
    return best * 1000, rpf / best / 1e6


def main():
    import jax.numpy as jnp

    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "photon"):
        engine = Engine(1920, 1088)
        engine.load_rtvs("/root/reference/sample_scene.rtvs",
                         enable_denoiser=False)
        backend = _pick_backend(engine._flat, engine._cfg)
        for n_ph in (0, 8192, 131072):
            cfg = make_config(engine._scene, 1920, 1088, samples_per_pixel=1,
                              max_bounces=5, enable_denoiser=False,
                              num_photons=n_ph)
            ms, _ = frame_time(engine, cfg, backend)
            print(f"photon frame[{n_ph}]: {ms:.1f} ms", flush=True)

    if which in ("all", "presplit"):
        sys.path.insert(0, "/root/repo/tests")
        from conftest import wine_glass_scene

        for factor in ("", "1.5", "2.5", "4.0"):
            os.environ["RTVS_PRESPLIT"] = factor
            scene, ms_svc = wine_glass_scene()
            engine = Engine(1920, 1088, mesh_service=ms_svc)
            engine.update_scene(scene)
            backend = _pick_backend(engine._flat, engine._cfg)
            nt = int(engine._flat.mesh.mk_num_tris)
            ms, mrays = frame_time(engine, engine._cfg, backend)
            print(f"presplit[{factor or 'off'}] tris={nt} [{backend}]: "
                  f"{ms:.1f} ms, {mrays:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
