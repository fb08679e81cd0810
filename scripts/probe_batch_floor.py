"""TPU probe: how much of the per-frame number is the tunnel round-trip
floor divided by the scan batch?

Times (a) a trivial scan body and (b) the fast-config full pipeline at
batch 8 vs 32. If per-frame cost drops by ~floor*(1/8 - 1/32) going 8->32,
the 'fixed F' in every per-frame number is the dispatch+fetch floor, not
renderer work — and the bench batch should amortize it harder.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_batch_floor.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"


def timeit(fn, *args, reps=4):
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
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, \
        _render_pipeline
    from raytracevs_tpu.post import denoise as denoise_mod

    # (a) trivial body: pure scan + one tiny op per step
    x = jnp.ones((8, 1088, 1920), jnp.float32)

    for batch in (8, 32):
        def run(x0):
            def step(c, i):
                return c + jnp.sum(x0[0, 0, :8]) * i, ()
            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(batch))
            return c
        t = timeit(run, x)
        print(f"trivial batch={batch:3}: {t*1e3:7.2f} ms total, "
              f"{t/batch*1e3:6.2f} ms/step", flush=True)

    # (b) fast config 1080p full pipeline
    W, H = 1920, 1088
    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=True, samples_per_pixel=1,
                     max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    state0 = denoise_mod.init_state_auto(H, W, backend)

    for batch in (8, 32):
        def run(scene, st):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                rgba, _h, rays, _g, new_st, _dn = _render_pipeline(
                    s_i, cfg, backend, carry, False)
                return new_st, (jnp.sum(rgba.astype(jnp.uint32)), rays)
            st, (cks, rays) = jax.lax.scan(step, st, jnp.arange(batch))
            return jnp.sum(cks), jnp.sum(rays), st
        t = timeit(run, flat, state0)
        print(f"fast1080 batch={batch:3}: {t*1e3:7.2f} ms total, "
              f"{t/batch*1e3:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
