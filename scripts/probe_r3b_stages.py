"""TPU probe: round-3b stage composition of the current frontier configs.

Measures, floor-free (lax.scan batched, on-device scalar fetch):
  - fast config (spp=1 b=5 denoiser ON) at 1080p and 4K: full CF pipeline,
    render-only, denoise-only (state-carried scan), composite+tonemap.
  - caustics at the 131,072 safe cap: emit_and_trace+hash, pallas gather.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3b_stages.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"
BATCH = 8


def timeit(fn, *args, reps=3):
    import jax

    g = jax.jit(fn)
    out = g(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = g(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts) / BATCH * 1000.0


def probe_res(W, H, label):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render_cf import render_rows_cf
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.post import tonemap
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, \
        _render_pipeline

    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=True, samples_per_pixel=1,
                     max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)
    print(f"[{label}] backend={backend}", flush=True)

    state0 = denoise_mod.init_state_cf(H, W)

    # 1) full pipeline, scan-batched with state carry (bench-equivalent)
    def full(scene):
        def step(st, i):
            s = scene._replace(frame_index=i)
            res = _render_pipeline(s, cfg, backend, st, want_aux=False)
            return res[4], jnp.sum(res[0].astype(jnp.uint32))

        _, sums = jax.lax.scan(step, state0,
                               jnp.arange(BATCH, dtype=jnp.uint32))
        return jnp.sum(sums)

    print(f"[{label}] full pipeline: {timeit(full, flat):.2f} ms", flush=True)

    # 2) render only
    def rend(scene):
        def step(c, i):
            s = scene._replace(frame_index=i)
            out = render_rows_cf(s, cfg, jnp.int32(0), H, backend=backend)
            return c + jnp.sum(out.gbuffer.diffuse_hitdist), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.uint32))
        return c

    print(f"[{label}] render_rows_cf: {timeit(rend, flat):.2f} ms", flush=True)

    # materialize one frame for the post-stage probes
    @jax.jit
    def mk(scene):
        return render_rows_cf(scene, cfg, jnp.int32(0), H, backend=backend)

    out0 = mk(flat)
    out0 = jax.tree_util.tree_map(lambda a: a.block_until_ready(), out0)
    gbuf, raw_spec = out0.gbuffer, out0.raw_specular

    # 3) denoise only (state-carried)
    def dn(gb):
        def step(st, i):
            g = gb._replace(view_z=gb.view_z + i.astype(jnp.float32) * 1e-7)
            dd, ds, dsh, st2 = denoise_mod.denoise_frame_cf(g, st)
            return st2, jnp.sum(dd)

        _, sums = jax.lax.scan(step, state0,
                               jnp.arange(BATCH, dtype=jnp.int32))
        return jnp.sum(sums)

    print(f"[{label}] denoise_frame_cf: {timeit(dn, gbuf):.2f} ms", flush=True)

    # 4) composite + tonemap (denoised inputs = raw planes; same op count)
    def comp(gb, rs):
        def step(c, i):
            g = gb._replace(view_z=gb.view_z + i.astype(jnp.float32) * 1e-7)
            col = composite_mod.composite_cf(
                g, rs, flat.exposure, flat.tone_map_operator, flat.gamma,
                denoised_diffuse=g.diffuse_hitdist[:3],
                denoised_specular=g.specular_hitdist[:3],
                use_denoised=True,
                nrd_bypass_distance=flat.nrd_bypass_distance,
                nrd_bypass_blend=flat.nrd_bypass_blend)
            return c + jnp.sum(tonemap.to_rgba8_cf(col).astype(jnp.uint32)), None

        c, _ = jax.lax.scan(step, jnp.uint32(0),
                            jnp.arange(BATCH, dtype=jnp.int32))
        return c

    print(f"[{label}] composite+tonemap: {timeit(comp, gbuf, raw_spec):.2f} ms",
          flush=True)
    return flat, cfg, backend


def probe_caustics(flat, cfg, H):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.render import caustics_delta
    from raytracevs_tpu.ops.render_cf import _planes_to_lanes3

    n_ph = 131072
    cfg_c = cfg._replace(num_photons=n_ph)

    def emit(scene):
        def step(c, i):
            s = scene._replace(frame_index=i)
            pmap = photon_mod.emit_and_trace(s, n_ph, backend="pallas")
            return c + jnp.sum(pmap.power), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.uint32))
        return c

    print(f"[caustics] emit_and_trace+hash 131k: {timeit(emit, flat):.2f} ms",
          flush=True)

    @jax.jit
    def mk(scene):
        acc = megakernel.render_accum_pallas_cf(scene, cfg_c, jnp.int32(0), H,
                                                False, mesh_hbm=False)
        pmap = photon_mod.emit_and_trace(scene, n_ph, backend="pallas")
        return acc, pmap

    acc, pmap = mk(flat)
    (acc, pmap) = jax.tree_util.tree_map(lambda a: a.block_until_ready(),
                                         (acc, pmap))

    def gath(pm, prim_hit, pos, nrm, met, trans):
        def step(c, i):
            p = pm._replace(power=pm.power + i.astype(jnp.float32) * 1e-9)
            d, _ = caustics_delta(flat, cfg_c, p, prim_hit, pos, nrm, met,
                                  trans, num_rows=H, backend="pallas")
            return c + jnp.sum(d), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.int32))
        return c

    args = (pmap, acc["prim_hit"].reshape(-1),
            _planes_to_lanes3(acc["prim_pos"]),
            _planes_to_lanes3(acc["prim_normal"]),
            acc["prim_metallic"].reshape(-1),
            acc["prim_transmission"].reshape(-1))
    print(f"[caustics] pallas gather 131k: {timeit(gath, *args):.2f} ms",
          flush=True)


def main():
    flat, cfg, backend = probe_res(1920, 1088, "1080p")
    probe_caustics(flat, cfg, 1088)
    probe_res(3840, 2160, "4k")


if __name__ == "__main__":
    main()
