"""TPU probe: CF-pipeline 4K stage deltas (scan-batched, in context).

render_cf only -> +denoise_cf -> full pipeline (want_aux=False). The
deltas locate the remaining 4K denoise cost now that the lane-interleave
churn is gone.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k_cf.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render_cf import render_rows_cf
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, _render_pipeline

    W, H = 3840, 2160
    engine = Engine(W, H)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=True,
                     samples_per_pixel=1, max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    batch = 4

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

    st0 = denoise_mod.init_state_cf(H, W)

    def render_only(scene, start):
        def step(c, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows_cf(s_i, cfg, jnp.int32(0), cfg.height,
                                 backend=backend)
            return c + jnp.sum(out.color), None

        c, _ = jax.lax.scan(step, 0.0, start + jnp.arange(batch))
        return c

    def render_reproject(scene, st, start):
        from raytracevs_tpu.ops.pallas import denoise_kernels as dk

        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows_cf(s_i, cfg, jnp.int32(0), cfg.height,
                                 backend=backend)
            g = out.gbuffer
            curr = jnp.concatenate([g.diffuse_hitdist, g.specular_hitdist], 0)
            np_ = dk.reproject_accumulate(carry.packed, curr, g.motion, g.view_z)
            return denoise_mod.DenoiserStateCF(packed=np_), jnp.sum(np_[0])

        st, s = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(s), st

    def render_denoise(scene, st, start):
        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows_cf(s_i, cfg, jnp.int32(0), cfg.height,
                                 backend=backend)
            dd, ds, dsh, carry = denoise_mod.denoise_frame_cf(
                out.gbuffer, carry)
            return carry, jnp.sum(dd) + jnp.sum(ds) + jnp.sum(dsh)

        st, s = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(s), st

    def full(scene, st, start):
        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, _r, _g, carry, _d = _render_pipeline(
                s_i, cfg, backend, carry, False)
            return carry, jnp.sum(rgba.astype(jnp.uint32))

        st, cks = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(cks), st

    ms_r = timeit(render_only, flat, jnp.int32(0))
    print(f"[4k cf] render-only: {ms_r:.1f} ms", flush=True)
    ms_rp = timeit(render_reproject, flat, st0, jnp.int32(0))
    print(f"[4k cf] +reproject: {ms_rp:.1f} (delta {ms_rp - ms_r:.1f})", flush=True)
    ms_rd = timeit(render_denoise, flat, st0, jnp.int32(0))
    print(f"[4k cf] +denoise all: {ms_rd:.1f} (atrous+shadow "
          f"{ms_rd - ms_rp:.1f})", flush=True)
    ms_f = timeit(full, flat, st0, jnp.int32(0))
    print(f"[4k cf] full: {ms_f:.1f} (composite {ms_f - ms_rd:.1f}) "
          f"-> {1000.0 / ms_f:.2f} FPS", flush=True)


if __name__ == "__main__":
    main()
