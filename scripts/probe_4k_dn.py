"""TPU probe: _denoise_frame_pallas total vs kernels-only at 4K.

The difference is the channel-first marshalling overhead (transposes of
gbuffer lanes + state pack/unpack).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k_dn.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import denoise_kernels as dk
    from raytracevs_tpu.ops.render import GBuffer
    from raytracevs_tpu.post import denoise as denoise_mod

    W, H = 3840, 2160
    n = H * W
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    gb = GBuffer(
        diffuse_hitdist=jax.random.uniform(ks[0], (n, 4), jnp.float32),
        specular_hitdist=jax.random.uniform(ks[1], (n, 4), jnp.float32),
        normal_roughness=jax.random.uniform(ks[2], (n, 4), jnp.float32),
        view_z=jax.random.uniform(ks[3], (n,), jnp.float32) * 10 + 1,
        motion=jax.random.uniform(ks[4], (n, 2), jnp.float32),
        albedo=jax.random.uniform(ks[5], (n, 4), jnp.float32),
        shadow_data=jax.random.uniform(ks[6], (n, 2), jnp.float32),
        shadow_translucency=jax.random.uniform(ks[7], (n, 3), jnp.float32),
        obj_id=(jax.random.uniform(ks[8], (n,)) * 4).astype(jnp.int32),
    )
    state = denoise_mod.init_state(H, W)

    def t(f, *args, reps=4, batch=2):
        def run(a0, start):
            def step(carry, i):
                out = f(a0, *args[1:])
                return carry + 1, jnp.sum(jax.tree_util.tree_leaves(out)[0])
            _, s = jax.lax.scan(step, 0, start + jnp.arange(batch))
            return jnp.sum(s)
        g = jax.jit(run)
        float(np.asarray(g(args[0], jnp.int32(0))))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(g(args[0], jnp.int32(r))))
            ts.append(time.perf_counter() - t0)
        return min(ts) / batch * 1000

    ms = t(lambda g_, s_: denoise_mod._denoise_frame_pallas(g_, H, W, s_),
           gb, state)
    print(f"_denoise_frame_pallas total: {ms:.1f} ms", flush=True)

    # kernels only, channel-first end to end
    packed = jax.random.uniform(ks[9], (16, H, W), jnp.float32)
    curr = jax.random.uniform(ks[10], (8, H, W), jnp.float32)
    motion = jax.random.uniform(ks[11], (2, H, W), jnp.float32)
    vz = jax.random.uniform(ks[3], (H, W), jnp.float32) * 10 + 1
    normal = jax.random.uniform(ks[5], (3, H, W), jnp.float32)
    shadow = jax.random.uniform(ks[6], (2, H, W), jnp.float32)
    oid = (jax.random.uniform(ks[8], (H, W)) * 4).astype(jnp.int32)

    def kernels_only(p, c, m, z, nm, sh, oi):
        newp = dk.reproject_accumulate(p, c, m, z)
        six = jnp.concatenate([newp[0:3], newp[4:7]], axis=0)
        out_ds = dk.atrous(six, z, nm)
        out_sh = dk.shadow_denoise(sh, oi, z, nm)
        return out_ds, out_sh, newp

    ms = t(kernels_only, packed, curr, motion, vz, normal, shadow, oid)
    print(f"kernels-only channel-first: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
