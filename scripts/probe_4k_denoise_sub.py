"""TPU probe: batched 4K denoise sub-stage breakdown on a REAL gbuffer.

The scan-batched 4K denoise stage measures 44.8 ms while the three kernels
sum to ~26 in single-dispatch probes. Isolate: marshalling (the [N,c] ->
[c,H,W] transposes + oct decode) vs each kernel on pre-marshalled input.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k_denoise_sub.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import denoise_kernels as dk
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    W, H = 3840, 2160
    engine = Engine(W, H)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=True,
                     samples_per_pixel=1, max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    batch = 4

    @jax.jit
    def mk_gbuf(scene):
        out = render_rows(scene, cfg, jnp.int32(0), cfg.height, backend=backend)
        return out.gbuffer

    gbuf = mk_gbuf(flat)
    gbuf = jax.tree_util.tree_map(lambda a: a.block_until_ready(), gbuf)

    def timeit(fn, *args, reps=3):
        g = jax.jit(fn)
        out = g(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = g(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts) / batch * 1000

    def scan_over(body, gbuf):
        def run(gb):
            def step(c, i):
                gb_i = gb._replace(
                    view_z=gb.view_z + i.astype(jnp.float32) * 1e-7)
                return c + body(gb_i), None

            c, _ = jax.lax.scan(run_init := step, 0.0, jnp.arange(batch))
            return c

        return run

    def marshal_body(gb):
        def cf(a, c):
            return a.reshape(H, W, c).transpose(2, 0, 1)

        diffuse = cf(gb.diffuse_hitdist, 4)
        specular = cf(gb.specular_hitdist, 4)
        motion = cf(gb.motion, 2)
        shadow = cf(gb.shadow_data, 2)
        nr = gb.normal_roughness.reshape(H, W, 4)
        normal = denoise_mod._decode_oct(nr).transpose(2, 0, 1)
        return (jnp.sum(diffuse) + jnp.sum(specular) + jnp.sum(motion)
                + jnp.sum(shadow) + jnp.sum(normal))

    ms = timeit(scan_over(marshal_body, gbuf), gbuf)
    print(f"[4k] marshal (cf transposes + oct decode): {ms:.1f} ms", flush=True)

    # pre-marshalled inputs for the kernel-only timings
    def cf(a, c):
        return a.reshape(H, W, c).transpose(2, 0, 1)

    packed0 = denoise_mod.init_state_auto(H, W, backend).packed
    curr = jnp.concatenate([cf(gbuf.diffuse_hitdist, 4),
                            cf(gbuf.specular_hitdist, 4)], axis=0)
    motion = cf(gbuf.motion, 2)
    view_z = gbuf.view_z.reshape(H, W)
    nr = gbuf.normal_roughness.reshape(H, W, 4)
    normal = denoise_mod._decode_oct(nr).transpose(2, 0, 1)
    shadow = cf(gbuf.shadow_data, 2)
    oid = gbuf.obj_id.reshape(H, W)
    six = curr[jnp.array([0, 1, 2, 4, 5, 6])]
    args = [a.block_until_ready() for a in
            (packed0, curr, motion, view_z, normal, shadow, six)]
    packed0, curr, motion, view_z, normal, shadow, six = args
    oid = oid.block_until_ready()

    def batched(body):
        def run(*xs):
            def step(c, i):
                return c + body(i.astype(jnp.float32), *xs), None

            c, _ = jax.lax.scan(step, 0.0, jnp.arange(batch))
            return c

        return run

    ms = timeit(batched(lambda i, p, c, m, z: jnp.sum(
        dk.reproject_accumulate(p, c + i * 1e-7, m, z))),
        packed0, curr, motion, view_z)
    print(f"[4k] reproject (batched): {ms:.1f} ms", flush=True)
    ms = timeit(batched(lambda i, s, z, n: jnp.sum(
        dk.atrous(s + i * 1e-7, z, n))), six, view_z, normal)
    print(f"[4k] atrous x3 fused (batched): {ms:.1f} ms", flush=True)
    ms = timeit(batched(lambda i, s, o, z, n: jnp.sum(
        dk.shadow_denoise(s + i * 1e-7, o, z, n))), shadow, oid, view_z, normal)
    print(f"[4k] shadow (batched): {ms:.1f} ms", flush=True)

    # full denoise_frame for cross-check (should be ~44.8 from prior probe)
    st0 = denoise_mod.init_state_auto(H, W, backend)

    def full(gb, st):
        def step(carry, i):
            gb_i = gb._replace(view_z=gb.view_z + i.astype(jnp.float32) * 1e-7)
            dd, ds, dsh, carry = denoise_mod.denoise_frame(
                gb_i, H, W, carry, backend=backend)
            return carry, jnp.sum(dd)

        st, s = jax.lax.scan(step, st, jnp.arange(batch))
        return jnp.sum(s)

    ms = timeit(full, gbuf, st0)
    print(f"[4k] full denoise_frame (batched): {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
