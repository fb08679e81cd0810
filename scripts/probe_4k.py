"""TPU probe: 4K frame composition — render vs denoise stages.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, _render_pipeline
    from raytracevs_tpu.scene.flatten import make_config

    W, H = 3840, 2160
    engine = Engine(W, H, device_mesh=None)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", samples_per_pixel=1,
                     max_bounces=5, enable_denoiser=True)
    backend = _pick_backend(engine._flat, engine._cfg)
    flat = engine._flat
    print("backend:", backend, flush=True)

    def timeit(f, *args, reps=4, batch=2):
        def run(scene, start):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                return carry, f(s_i)
            _, out = jax.lax.scan(step, 0, start + jnp.arange(batch))
            return jnp.sum(out)
        g = jax.jit(run)
        float(np.asarray(g(flat, jnp.int32(0))))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(g(flat, jnp.int32(batch * (r + 1)))))
            ts.append(time.perf_counter() - t0)
        return min(ts) / batch * 1000

    cfg_off = make_config(engine._scene, W, H, samples_per_pixel=1,
                          max_bounces=5, enable_denoiser=False)
    cfg_on = make_config(engine._scene, W, H, samples_per_pixel=1,
                         max_bounces=5, enable_denoiser=True)

    ms = timeit(lambda s: jnp.sum(render_rows(s, cfg_off, jnp.int32(0), H,
                                              backend=backend).color))
    print(f"render only: {ms:.1f} ms", flush=True)

    state = denoise_mod.init_state(H, W)

    def full(s):
        rgba, _h, _r, _g, _st, _dn = _render_pipeline(s, cfg_on, backend, state)
        return jnp.sum(rgba.astype(jnp.uint32))

    ms_full = timeit(full)
    print(f"full denoised pipeline: {ms_full:.1f} ms", flush=True)

    # stage isolation: one rendered gbuffer, then time denoise stages
    out = render_rows(flat, cfg_on, jnp.int32(0), H, backend=backend)
    g = out.gbuffer
    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    def cf(a, c):
        return a.reshape(H, W, c).transpose(2, 0, 1)

    packed = jnp.concatenate(
        [state.diffuse.transpose(2, 0, 1), state.specular.transpose(2, 0, 1),
         state.fast_diffuse.transpose(2, 0, 1),
         state.fast_specular.transpose(2, 0, 1),
         state.frames[None], state.view_z[None]], axis=0)
    curr = jnp.concatenate([cf(g.diffuse_hitdist, 4), cf(g.specular_hitdist, 4)],
                           axis=0)
    motion = cf(g.motion, 2)
    vz = g.view_z.reshape(H, W)
    nr = g.normal_roughness.reshape(H, W, 4)
    shadow = cf(g.shadow_data, 2)
    oid = g.obj_id.reshape(H, W)
    from raytracevs_tpu.post.denoise import _decode_oct

    normal = _decode_oct(nr).transpose(2, 0, 1)
    img6 = curr[0:3], curr[4:7]
    six = jnp.concatenate([curr[0:3], curr[4:7]], axis=0)

    def t_simple(f, reps=4):
        g2 = jax.jit(f)
        float(np.asarray(jnp.sum(g2())))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(jnp.sum(g2())))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    ms = t_simple(lambda: dk.reproject_accumulate(packed, curr, motion, vz))
    print(f"reproject_accumulate: {ms:.1f} ms", flush=True)
    ms = t_simple(lambda: dk.atrous(six, vz, normal))
    print(f"atrous x3: {ms:.1f} ms", flush=True)
    ms = t_simple(lambda: dk.shadow_denoise(shadow, oid, vz, normal))
    print(f"shadow_denoise: {ms:.1f} ms", flush=True)
    ms = t_simple(lambda: _decode_oct(nr).transpose(2, 0, 1))
    print(f"decode_oct+transpose: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
