"""TPU probe: photon pass jnp vs pallas trace at the 131k/32k budgets.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_photon3.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon
    from raytracevs_tpu.runtime.engine import Engine

    engine = Engine(256, 256)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    flat = engine._flat
    batch = 8

    for n in (131072, 32768):
        for backend in ("jnp", "pallas"):
            def run(scene, s0):
                def step(carry, i):
                    s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                    pm = photon.emit_and_trace(s_i, n, backend=backend)
                    return carry + pm.count, jnp.sum(pm.position)

                c, ps = jax.lax.scan(step, jnp.int32(0),
                                     s0 + jnp.arange(batch))
                return c + jnp.sum(ps)

            f = jax.jit(run)
            float(np.asarray(f(flat, jnp.int32(0))))
            ts = []
            for r in range(4):
                t0 = time.perf_counter()
                float(np.asarray(f(flat, jnp.int32(r + 1))))
                ts.append(time.perf_counter() - t0)
            print(f"emit_and_trace[{n}] {backend}: "
                  f"{min(ts)/batch*1000:.2f} ms", flush=True)

        # stored-count sanity: both backends agree
        pm_j = photon.emit_and_trace(flat, n, backend="jnp")
        pm_p = photon.emit_and_trace(flat, n, backend="pallas")
        print(f"  counts jnp={int(np.asarray(pm_j.count))} "
              f"pallas={int(np.asarray(pm_p.count))}", flush=True)


if __name__ == "__main__":
    main()
