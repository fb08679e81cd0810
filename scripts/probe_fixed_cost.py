"""TPU probe: fixed-vs-per-sample cost split of the fast render config.

The fast config (spp=1 b=5) renders ~600 Mrays/s while spp=12 b=10 sustains
~883 — the gap is per-frame fixed work (primary setup, G-buffer plane
assembly/writes, tile prologue) amortized by spp. Sweep spp at fixed
bounces, fit time(spp) = F + spp*V, floor-free (lax.scan batch + scalar
fetch), render-only (denoiser off, want_aux=False).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fixed_cost.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"
BATCH = 8


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


def probe_res(W, H, spps, label):
    import jax.numpy as jnp
    import jax

    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, \
        _render_pipeline
    from raytracevs_tpu.scene.flatten import make_config

    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=False, samples_per_pixel=1,
                     max_bounces=5)
    flat = engine._flat
    rows = {}
    for spp in spps:
        cfg = make_config(engine._scene, W, H, samples_per_pixel=spp,
                          max_bounces=5, enable_denoiser=False)
        backend = _pick_backend(flat, cfg)

        def run(scene):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                rgba, _h, rays, _g, _st, _dn = _render_pipeline(
                    s_i, cfg, backend, None, False)
                return carry, (jnp.sum(rgba.astype(jnp.uint32)), rays)

            _, (cks, rays) = jax.lax.scan(step, 0, jnp.arange(BATCH))
            return jnp.sum(cks), jnp.sum(rays)

        ms = timeit(run, flat)
        rows[spp] = ms
        print(f"[{label}] spp={spp:2d} b=5 render_only={ms:7.2f} ms",
              flush=True)
    ss = sorted(rows)
    if len(ss) >= 2:
        # least-squares fit F + spp*V
        xs = np.array(ss, np.float64)
        ys = np.array([rows[s] for s in ss])
        V, F = np.polyfit(xs, ys, 1)
        print(f"[{label}] fit: fixed F={F:.2f} ms, per-sample V={V:.2f} ms "
              f"(fixed is {100*F/rows[ss[0]]:.0f}% of spp={ss[0]})",
              flush=True)


def main():
    probe_res(1920, 1088, [1, 2, 4, 8], "1080p")
    probe_res(3840, 2160, [1, 2, 4], "4k")


if __name__ == "__main__":
    main()
