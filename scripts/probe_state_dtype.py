"""TPU probe: half-precision denoiser history + stencil windows.

Measures the bandwidth-bound denoise kernels at 4K/1080p with the history
state (reproject) / packed stencil window (atrous, shadow) stored in f32 vs
bf16 vs f16. Compute always runs f32 inside the kernels; only storage/DMA
precision varies. Also reports the max deviation of the half-precision
result vs the f32 result after an 8-frame accumulation scan (the quality
side of the trade).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_state_dtype.py
"""
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
        img6 = jax.random.uniform(ks[1], (6, H, W), jnp.float32)
        nrm = jax.random.uniform(ks[2], (3, H, W), jnp.float32)
        shadow = jax.random.uniform(ks[3], (2, H, W), jnp.float32)
        oid = jnp.zeros((H, W), jnp.int32)

        results = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                         ("f16", jnp.float16)):
            # --- reproject: 8-frame accumulation scan in the state dtype
            @jax.jit
            def rp_many(p, c, m, z):
                def step(carry, i):
                    return dk.reproject_accumulate(carry, c + i * 1e-7, m, z), None

                p2, _ = jax.lax.scan(step, p,
                                     jnp.arange(batch, dtype=jnp.float32))
                return p2

            try:
                p0 = packed.astype(dt)
                out = rp_many(p0, curr, motion, vz)
                float(np.asarray(jnp.sum(out[0].astype(jnp.float32))))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(np.asarray(jnp.sum(
                        rp_many(p0, curr, motion, vz)[0].astype(jnp.float32))))
                    ts.append(time.perf_counter() - t0)
                results[name] = np.asarray(out.astype(jnp.float32))
                err = ""
                if name != "f32" and "f32" in results:
                    d = np.abs(results[name] - results["f32"])
                    r = results["f32"]
                    rel = (d / np.maximum(np.abs(r), 1e-3)).max()
                    err = f"  maxabs={d.max():.2e} maxrel={rel:.2e}"
                print(f"[{W}x{H}] reproject {name}: "
                      f"{min(ts)/batch*1000:.2f} ms{err}", flush=True)
            except Exception as e:
                print(f"[{W}x{H}] reproject {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

            # --- atrous fused, storage dtype on the packed window
            sd = None if name == "f32" else dt

            @jax.jit
            def at_many(im, z, n):
                def step(carry, i):
                    return dk.atrous(carry + i * 1e-7, z, n, passes=3,
                                     storage_dtype=sd), None

                o, _ = jax.lax.scan(step, im,
                                    jnp.arange(batch, dtype=jnp.float32))
                return jnp.sum(o[0])

            try:
                float(np.asarray(at_many(img6, vz, nrm)))
                ts = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    float(np.asarray(at_many(img6, vz, nrm)))
                    ts.append(time.perf_counter() - t0)
                print(f"[{W}x{H}] atrous3   {name}: "
                      f"{min(ts)/batch*1000:.2f} ms", flush=True)
            except Exception as e:
                print(f"[{W}x{H}] atrous3   {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
