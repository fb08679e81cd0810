"""TPU probe: photon-gather optimization candidates at the 131k cap.

Variants (monkeypatched into ops/pallas/photon_gather, no package edits):
  - TILE_H 32 (baseline) / 16 / 8: smaller tiles have a tighter world
    footprint -> fewer chunk visits, at more programs + per-program box walks.
  - ops-dieted chunk_scan: accept as f32 multiplier + FMA accumulate
    instead of 3x select; saves ~4/30 ops per (lane,photon).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather_opt.py
"""
import time

import numpy as np

SCENE = "/root/reference/sample_scene.rtvs"
BATCH = 8
N_PH = 131072


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


def dieted_make_kernel(pg_mod):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from raytracevs_tpu import constants as C

    F32 = jnp.float32
    I32 = jnp.int32
    CHUNK = pg_mod.CHUNK
    SUPER = pg_mod.SUPER
    _pg = pg_mod._pg

    def make(n_chunks, radius, intensity):
        r2 = float(radius) * float(radius)
        r = float(radius)
        max_gather = C.MAX_GATHER_PHOTONS_THRESHOLD
        n_super = -(-n_chunks // SUPER)

        def kernel(px_ref, ph_ref, cb_ref, sb_ref, out_ref):
            pos = (px_ref[0], px_ref[1], px_ref[2])
            nrm = (px_ref[3], px_ref[4], px_ref[5])
            elig_i = (px_ref[6] > 0.5).astype(I32)
            zero = pos[0] * 0.0
            izero = zero.astype(I32)

            out_ref[0, :, :] = jnp.zeros_like(zero)
            out_ref[1, :, :] = jnp.zeros_like(zero)
            out_ref[2, :, :] = jnp.zeros_like(zero)

            def box_near(bb, active_i):
                return (
                    (active_i != 0)
                    & (pos[0] >= bb[0, 0] - r) & (pos[0] <= bb[0, 3] + r)
                    & (pos[1] >= bb[0, 1] - r) & (pos[1] <= bb[0, 4] + r)
                    & (pos[2] >= bb[0, 2] - r) & (pos[2] <= bb[0, 5] + r)
                )

            def chunk_scan(c, carry):
                cr, cg, cb_, wsum, cnt = carry
                base = pl.multiple_of(c * (CHUNK // 8), 8)
                blk = ph_ref[pl.ds(base, 8), :]
                for k in range(CHUNK):
                    dx = pos[0] - _pg(blk, k, 0)
                    dy = pos[1] - _pg(blk, k, 1)
                    dz = pos[2] - _pg(blk, k, 2)
                    d2 = dx * dx + dy * dy + dz * dz
                    dot_n = -(_pg(blk, k, 3) * nrm[0] + _pg(blk, k, 4) * nrm[1]
                              + _pg(blk, k, 5) * nrm[2])
                    accept = ((d2 < r2) & (dot_n > 0.0) & (cnt < max_gather)
                              & (_pg(blk, k, 10) > 0.5))
                    af = accept.astype(F32)
                    w = jnp.exp(-d2 / F32(r2)) * dot_n * af
                    pw = _pg(blk, k, 9) * w
                    cr = cr + _pg(blk, k, 6) * pw
                    cg = cg + _pg(blk, k, 7) * pw
                    cb_ = cb_ + _pg(blk, k, 8) * pw
                    wsum = wsum + w
                    cnt = cnt + accept.astype(I32)
                return cr, cg, cb_, wsum, cnt

            def super_body(s, carry):
                cr, cg, cb_, wsum, cnt = carry
                sb = sb_ref[pl.ds(s, 1), :]
                near_s = box_near(sb, elig_i & (cnt < max_gather).astype(I32))
                near_s_i = near_s.astype(I32)

                def scan_super(carry):
                    def chunk_body(ci, inner):
                        cr, cg, cb_, wsum, cnt = inner
                        c = s * SUPER + ci
                        cbb = cb_ref[pl.ds(c, 1), :]
                        near_c = box_near(
                            cbb, near_s_i & (cnt < max_gather).astype(I32))
                        return jax.lax.cond(
                            jnp.any(near_c), lambda x: chunk_scan(c, x),
                            lambda x: x, (cr, cg, cb_, wsum, cnt))

                    return jax.lax.fori_loop(0, SUPER, chunk_body, carry)

                return jax.lax.cond(jnp.any(near_s), scan_super, lambda x: x,
                                    (cr, cg, cb_, wsum, cnt))

            @pl.when(jnp.any(elig_i != 0))
            def _tile():
                init = (zero, zero, zero, zero, izero)
                cr, cg, cb_, wsum, _cnt = jax.lax.fori_loop(
                    0, n_super, super_body, init)
                area = F32(3.14159265) * F32(r2)
                hasw = wsum > 0.0
                scale = F32(intensity) / area
                out_ref[0, :, :] = jnp.where(hasw, cr * scale, 0.0)
                out_ref[1, :, :] = jnp.where(hasw, cg * scale, 0.0)
                out_ref[2, :, :] = jnp.where(hasw, cb_ * scale, 0.0)

        return kernel

    return make


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.pallas import photon_gather as pg
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.ops.render_cf import _planes_to_lanes3

    W, H = 1920, 1088
    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=False, samples_per_pixel=1,
                     max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    cfg_c = cfg._replace(num_photons=N_PH)

    @jax.jit
    def mk(scene):
        acc = megakernel.render_accum_pallas_cf(scene, cfg_c, jnp.int32(0), H,
                                                False, mesh_hbm=False)
        pmap = photon_mod.emit_and_trace(scene, N_PH, backend="pallas")
        return acc, pmap

    acc, pmap = mk(flat)
    (acc, pmap) = jax.tree_util.tree_map(lambda a: a.block_until_ready(),
                                         (acc, pmap))
    pos = _planes_to_lanes3(acc["prim_pos"])
    nrm = _planes_to_lanes3(acc["prim_normal"])
    elig = (acc["prim_hit"].reshape(-1)
            & (acc["prim_metallic"].reshape(-1) < 0.5)
            & (acc["prim_transmission"].reshape(-1) <= 0.01))

    def run_gather(pm, pos, nrm, elig):
        def step(c, i):
            p = pm._replace(power=pm.power + i.astype(jnp.float32) * 1e-9)
            out = pg.gather_pallas(p, pos, nrm, elig, H, W)
            return c + jnp.sum(out), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.int32))
        return c

    ref_sum = None
    base_make = pg._make_kernel
    diet_make = dieted_make_kernel(pg)
    for th in (32, 16, 8):
        for name, mk_fn in (("base", base_make), ("diet", diet_make)):
            pg.TILE_H = th
            pg._make_kernel = mk_fn
            try:
                t = timeit(run_gather, pmap, pos, nrm, elig)
                g = jax.jit(lambda: jnp.sum(
                    pg.gather_pallas(pmap, pos, nrm, elig, H, W)))()
                s = float(np.asarray(g))
                if ref_sum is None:
                    ref_sum = s
                drift = abs(s - ref_sum) / max(abs(ref_sum), 1e-9)
                print(f"tile_h={th:2d} {name}: {t:7.2f} ms  "
                      f"(sum drift {drift:.2e})", flush=True)
            except Exception as e:
                print(f"tile_h={th:2d} {name}: FAILED {str(e)[:100]}",
                      flush=True)
    pg.TILE_H = 32
    pg._make_kernel = base_make


if __name__ == "__main__":
    main()
