"""TPU probe: denoise stage costs at 4K (args passed, not closed over).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k_stages.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import denoise_kernels as dk
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.post import tonemap

    for W, H in ((3840, 2160), (1920, 1088)):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        packed = jax.random.uniform(ks[0], (16, H, W), jnp.float32)
        curr = jax.random.uniform(ks[1], (8, H, W), jnp.float32)
        motion = jax.random.uniform(ks[2], (2, H, W), jnp.float32) * 2 - 1
        vz = jax.random.uniform(ks[3], (H, W), jnp.float32) * 10 + 1
        six = jax.random.uniform(ks[4], (6, H, W), jnp.float32)
        normal = jax.random.uniform(ks[5], (3, H, W), jnp.float32)
        shadow = jax.random.uniform(ks[6], (2, H, W), jnp.float32)
        oid = (jax.random.uniform(ks[7], (H, W)) * 4).astype(jnp.int32)

        def t(f, *args, reps=4):
            g = jax.jit(f)
            float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(g(*args))[0])))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(g(*args))[0])))
                ts.append(time.perf_counter() - t0)
            return min(ts) * 1000

        tag = f"{W}x{H}"
        ms = t(lambda p, c, m, z: dk.reproject_accumulate(p, c, m, z),
               packed, curr, motion, vz)
        print(f"[{tag}] reproject: {ms:.1f} ms", flush=True)
        ms = t(lambda s, z, n: dk.atrous(s, z, n), six, vz, normal)
        print(f"[{tag}] atrous x3: {ms:.1f} ms", flush=True)
        ms = t(lambda s, o, z, n: dk.shadow_denoise(s, o, z, n),
               shadow, oid, vz, normal)
        print(f"[{tag}] shadow: {ms:.1f} ms", flush=True)

        # composite + tonemap on lane arrays
        n = H * W
        g = type("G", (), {})()
        alb = jax.random.uniform(ks[0], (n, 4), jnp.float32)

        class GB:
            albedo = alb
            diffuse_hitdist = jax.random.uniform(ks[1], (n, 4), jnp.float32)
            view_z = vz.reshape(n)

        raw_spec = jax.random.uniform(ks[2], (n, 3), jnp.float32)
        dd = jax.random.uniform(ks[3], (n, 3), jnp.float32)
        ds = jax.random.uniform(ks[4], (n, 3), jnp.float32)

        def comp(a, dh, z, rs, d1, d2):
            class G2:
                albedo = a
                diffuse_hitdist = dh
                view_z = z
            c = composite_mod.composite(G2, rs, jnp.float32(1.0), 1,
                                        jnp.float32(2.2), denoised_diffuse=d1,
                                        denoised_specular=d2, use_denoised=True)
            return tonemap.to_rgba8(c)

        ms = t(comp, alb, GB.diffuse_hitdist, GB.view_z, raw_spec, dd, ds)
        print(f"[{tag}] composite+tonemap: {ms:.1f} ms", flush=True)

        # the channel-first marshalling in _denoise_frame_pallas
        lane = jax.random.uniform(ks[5], (n, 4), jnp.float32)

        def marshal(a):
            return a.reshape(H, W, 4).transpose(2, 0, 1)

        ms = t(marshal, lane)
        print(f"[{tag}] one [N,4]->[4,H,W] transpose: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
