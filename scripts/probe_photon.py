"""TPU probe: photon pass cost — emit/trace at several widths + frame delta.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_photon.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config

    engine = Engine(1920, 1088)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    flat = engine._flat
    backend = _pick_backend(engine._flat, engine._cfg)
    print("backend:", backend, flush=True)

    # 1) emit/trace+hash alone
    for n in (8192, 32768, 131072):
        def run(scene):
            pm = photon.emit_and_trace(scene, n)
            return pm.count + jnp.sum(pm.position)

        f = jax.jit(run)
        float(np.asarray(f(flat)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(f(flat)))
            ts.append(time.perf_counter() - t0)
        print(f"emit_and_trace[{n}]: {min(ts)*1000:.1f} ms (incl ~26ms tunnel floor)",
              flush=True)

    # 2) frame delta: spp=1 b=5 with photons vs without (batched scan x4)
    def frame_time(num_photons):
        cfg = make_config(engine._scene, 1920, 1088, samples_per_pixel=1,
                          max_bounces=5, enable_denoiser=False,
                          num_photons=num_photons)

        def run(scene, start):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                out = render_rows(s_i, cfg, jnp.int32(0), cfg.height,
                                  backend=backend)
                return carry, jnp.sum(out.color)

            _, cks = jax.lax.scan(step, 0, start + jnp.arange(4))
            return jnp.sum(cks)

        f = jax.jit(run)
        float(np.asarray(f(flat, jnp.int32(0))))
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            float(np.asarray(f(flat, jnp.int32(4 * (r + 1)))))
            ts.append(time.perf_counter() - t0)
        return min(ts) / 4 * 1000

    base = frame_time(0)
    print(f"frame[photons=0]: {base:.1f} ms", flush=True)
    for n in (8192, 131072):
        t = frame_time(n)
        print(f"frame[photons={n}]: {t:.1f} ms (delta {t-base:+.1f})", flush=True)


if __name__ == "__main__":
    main()
