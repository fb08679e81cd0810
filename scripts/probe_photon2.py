"""TPU probe: floor-free photon-pass split at the 131k safe cap.

Times emit_and_trace with the bounce loop at its real depth (4) vs patched
to 0 — the difference is the pure bounce-loop cost (the candidate for a
Pallas tile kernel); the remainder is emit + sort-based hash build.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_photon2.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu import constants as C
    from raytracevs_tpu.ops import photon
    from raytracevs_tpu.runtime.engine import Engine

    engine = Engine(256, 256)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    flat = engine._flat
    batch = 8

    for n in (131072, 32768):
        for depth in (4, 0, 1):
            C.MAX_PHOTON_BOUNCES = depth

            def run(scene, s0):
                def step(carry, i):
                    s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                    pm = photon.emit_and_trace(s_i, n)
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
            print(f"emit_and_trace[{n}] depth={depth}: "
                  f"{min(ts)/batch*1000:.2f} ms", flush=True)
    C.MAX_PHOTON_BOUNCES = 4


if __name__ == "__main__":
    main()
