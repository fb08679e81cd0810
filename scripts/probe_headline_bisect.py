"""TPU probe: bisect the HEADLINE config (scene-carried spp=12 b=10,
denoiser off) analytic render cost at 1080p with the megakernel kill
switches, in ONE process (the flags are a module global read at trace
time — monkeypatch between jits). Floor-free via large scan batch.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_headline_bisect.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"
BATCH = 8  # spp12 frames are ~82 ms — batch 8 keeps floor <4%
FLAGS = [None, "shadow", "spawn", "gspawn", "perturb", "fresnel",
         "shadow,spawn,gspawn", "fori"]


def timeit(fn, *args, reps=3):
    import jax

    g = jax.jit(fn)
    out = g(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = g(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / BATCH * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.render_cf import render_rows_cf
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    W, H = 1920, 1088
    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=False)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    print(f"spp={cfg.samples_per_pixel} bounces={cfg.max_bounces} "
          f"backend={backend}", flush=True)
    print(f"caps: s={flat.sphere_capacity} p={flat.plane_capacity} "
          f"b={flat.box_capacity} lights={int(np.asarray(flat.num_lights))}",
          flush=True)

    base = None
    for flags in FLAGS:
        megakernel._DEBUG_DISABLE = (
            frozenset() if flags is None else frozenset(flags.split(",")))

        def rend(scene):
            def step(c, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                out = render_rows_cf(s_i, cfg, jnp.int32(0), H,
                                     backend=backend)
                return c + jnp.sum(out.gbuffer.diffuse_hitdist), ()

            c, _ = jax.lax.scan(
                step, jnp.float32(0), jnp.arange(BATCH, dtype=jnp.uint32))
            return c

        t = timeit(rend, flat)
        if flags is None:
            base = t
        d = "" if flags is None else f"  (-{base - t:6.2f} ms)"
        print(f"disable={flags or 'NONE':24}: {t:7.2f} ms/frame{d}",
              flush=True)


if __name__ == "__main__":
    main()
