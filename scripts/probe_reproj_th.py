"""TPU probe: reproject tile-height sweep at 4K + 1080p (batched).

PYTHONPATH=/root/repo:/root/.axon_site RTVS_REPROJ_TH=16 python ...
(th is read at import; this script sweeps by reloading in-process via the
module global instead: we monkeypatch os.environ before each jit build and
clear jax caches.)
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    batch = 8
    for W, H in ((3840, 2160), (1920, 1088)):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        packed = jax.random.uniform(ks[0], (16, H, W), jnp.float32)
        curr = jax.random.uniform(ks[1], (8, H, W), jnp.float32)
        motion = jax.random.uniform(ks[2], (2, H, W), jnp.float32) * 2 - 1
        vz = jax.random.uniform(ks[3], (H, W), jnp.float32) * 10 + 1

        for th in (8, 16, 32):
            os.environ["RTVS_REPROJ_TH"] = str(th)
            jax.clear_caches()

            @jax.jit
            def many(p, c, m, z):
                def step(carry, i):
                    np_ = dk.reproject_accumulate(carry, c + i * 1e-7, m, z)
                    return np_, None

                p2, _ = jax.lax.scan(step, p, jnp.arange(batch, dtype=jnp.float32))
                return jnp.sum(p2[0])

            try:
                float(np.asarray(many(packed, curr, motion, vz)))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(np.asarray(many(packed, curr, motion, vz)))
                    ts.append(time.perf_counter() - t0)
                print(f"[{W}x{H}] th={th}: {min(ts)/batch*1000:.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"[{W}x{H}] th={th}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    os.environ["RTVS_REPROJ_TH"] = "8"


if __name__ == "__main__":
    main()
