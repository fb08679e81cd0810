"""TPU probe: batched (scan-amortized) 4K fast-config stage breakdown.

Stage sums from single-dispatch probes (~68 ms) under-shoot the measured
81 ms frame; this probe times each pipeline prefix with the same lax.scan
harness bench.py uses, so the deltas are trustworthy:
  render-only -> +denoise -> +composite+tonemap (full)

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_4k_batched.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.post import tonemap
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    W, H = 3840, 2160
    engine = Engine(W, H)
    engine.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=True,
                     samples_per_pixel=1, max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    print(f"backend={backend}", flush=True)
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

    state0 = denoise_mod.init_state_auto(H, W, backend)

    def render_only(scene, start):
        def step(c, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows(s_i, cfg, jnp.int32(0), cfg.height, backend=backend)
            return c + jnp.sum(out.color), None

        c, _ = jax.lax.scan(step, 0.0, start + jnp.arange(batch))
        return c

    def render_denoise(scene, st, start):
        def step(carry, i):
            st = carry
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows(s_i, cfg, jnp.int32(0), cfg.height, backend=backend)
            dd, ds, dsh, st = denoise_mod.denoise_frame(
                out.gbuffer, H, W, st, backend=backend)
            return st, jnp.sum(dd) + jnp.sum(ds) + jnp.sum(dsh)

        st, s = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(s), st

    def full(scene, st, start):
        from raytracevs_tpu.runtime.engine import _render_pipeline

        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, _r, _g, st, _d = _render_pipeline(s_i, cfg, backend, carry)
            return st, jnp.sum(rgba.astype(jnp.uint32))

        st, cks = jax.lax.scan(step, st, start + jnp.arange(batch))
        return jnp.sum(cks), st

    ms_r = timeit(render_only, flat, jnp.int32(0))
    print(f"[4k] render-only: {ms_r:.1f} ms", flush=True)
    ms_rd = timeit(render_denoise, flat, state0, jnp.int32(0))
    print(f"[4k] render+denoise: {ms_rd:.1f} ms (denoise {ms_rd - ms_r:.1f})",
          flush=True)
    ms_f = timeit(full, flat, state0, jnp.int32(0))
    print(f"[4k] full pipeline: {ms_f:.1f} ms (composite+tonemap+hdr "
          f"{ms_f - ms_rd:.1f}) -> {1000.0 / ms_f:.2f} FPS", flush=True)


if __name__ == "__main__":
    main()
