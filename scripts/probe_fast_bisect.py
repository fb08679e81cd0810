"""TPU probe: bisect the fast-config (spp=1 b=5) analytic render cost at
1080p and 4K with the megakernel kill switches, in ONE process (the flags
are a module global read at trace time — monkeypatch between jits).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fast_bisect.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"
BATCH = 8
FLAGS = [None, "shadow", "spawn", "gspawn", "perturb", "fresnel", "fori",
         "shadow,spawn,gspawn"]


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


def probe_res(W, H, label):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.render_cf import render_rows_cf
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=False, samples_per_pixel=1,
                     max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)

    for flags in FLAGS:
        megakernel._DEBUG_DISABLE = (
            frozenset() if flags is None else frozenset(flags.split(",")))

        def rend(scene):
            def step(c, i):
                s = scene._replace(frame_index=i)
                out = render_rows_cf(s, cfg, jnp.int32(0), H, backend=backend)
                return c + jnp.sum(out.gbuffer.diffuse_hitdist), None

            c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.uint32))
            return c

        try:
            t = timeit(rend, flat)
            print(f"[{label}] disable={flags or '-':24s} {t:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"[{label}] disable={flags or '-':24s} FAILED "
                  f"{str(e)[:80]}", flush=True)
    megakernel._DEBUG_DISABLE = frozenset()


def main():
    probe_res(1920, 1088, "1080p")
    probe_res(3840, 2160, "4k")


if __name__ == "__main__":
    main()
