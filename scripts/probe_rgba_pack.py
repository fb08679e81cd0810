"""TPU A/B: channel-first -> RGBA8 interleave formulations at 4K.

  transpose   current to_rgba8_cf: u8 transpose(1,2,0) + concat alpha
  u32pack     R | G<<8 | B<<16 | 255<<24 on u32 planes, bitcast -> [H,W,4]
              (no transpose; bitcast is a reinterpret on row-major layout)

Also checks exact equality of the two on device.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rgba_pack.py
"""
import time

import numpy as np

BATCH = 8
H, W = 2160, 3840


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.post import tonemap as tm

    def u32pack(color01_cf):
        c = jnp.clip(color01_cf * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint32)
        word = c[0] | (c[1] << 8) | (c[2] << 16) | jnp.uint32(0xFF000000)
        return jax.lax.bitcast_convert_type(word, jnp.uint8)

    key = jax.random.PRNGKey(0)
    col = jax.random.uniform(key, (3, H, W), jnp.float32)

    a = np.asarray(jax.jit(tm.to_rgba8_cf)(col))
    b = np.asarray(jax.jit(u32pack)(col))
    print("equal:", bool((a == b).all()), flush=True)

    cols = jnp.stack([col, col * 0.5])  # two inputs so the body can't hoist

    def scan_time(fn):
        def run(cs):
            def step(c, i):
                out = fn(cs[i % 2])
                return c + out[0, 0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(BATCH))
            return c
        g = jax.jit(run)
        float(np.asarray(g(cols)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(g(cols)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / BATCH * 1000.0

    print(f"transpose: {scan_time(tm.to_rgba8_cf):6.2f} ms", flush=True)
    print(f"u32pack:   {scan_time(u32pack):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
