"""TPU probe: photon-gather cost decomposition at the 131k cap.

Variants (monkeypatched kernels, no package edits):
  - overhead: eligible=False everywhere -> pack_photons + launch floor.
  - walk-only: chunk_scan body replaced by visit counter -> box-walk cost,
    and reports total chunk visits (sum over tiles of per-tile visits).
  - full (baseline) for reference.
  - rebalanced CHUNK/SUPER would need repacking; instead test SUPER-level
    granularity by disabling the superchunk level (chunk boxes only).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather2.py
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


def walkonly_make_kernel(pg_mod, count_visits=True):
    """chunk_scan counts visits instead of evaluating photons."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    F32 = jnp.float32
    I32 = jnp.int32
    SUPER = pg_mod.SUPER

    def make(n_chunks, radius, intensity):
        r = float(radius)
        n_super = -(-n_chunks // SUPER)

        def kernel(px_ref, ph_ref, cb_ref, sb_ref, out_ref):
            pos = (px_ref[0], px_ref[1], px_ref[2])
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

            def super_body(s, carry):
                visits, = carry
                sb = sb_ref[pl.ds(s, 1), :]
                near_s = box_near(sb, elig_i)
                near_s_i = near_s.astype(I32)

                def scan_super(carry):
                    def chunk_body(ci, inner):
                        visits, = inner
                        c = s * SUPER + ci
                        cbb = cb_ref[pl.ds(c, 1), :]
                        near_c = box_near(cbb, near_s_i)
                        return (visits + jnp.any(near_c).astype(I32),)

                    return jax.lax.fori_loop(0, SUPER, chunk_body, carry)

                return jax.lax.cond(jnp.any(near_s), scan_super, lambda x: x,
                                    (visits,))

            @pl.when(jnp.any(elig_i != 0))
            def _tile():
                visits, = jax.lax.fori_loop(0, n_super, super_body, (izero,))
                # visits is a per-tile scalar... it's [32,128] vector (izero
                # is vector); all lanes identical. Emit it on channel 0.
                out_ref[0, :, :] = visits.astype(F32)

        return kernel

    return make


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.pallas import photon_gather as pg
    from raytracevs_tpu.runtime.engine import Engine
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
    n_elig = int(np.asarray(jnp.sum(elig)))
    print(f"eligible lanes: {n_elig}/{H*W} ({100.0*n_elig/(H*W):.1f}%)",
          flush=True)

    def run_gather(pm, pos, nrm, elig):
        def step(c, i):
            p = pm._replace(power=pm.power + i.astype(jnp.float32) * 1e-9)
            out = pg.gather_pallas(p, pos, nrm, elig, H, W)
            return c + jnp.sum(out), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.int32))
        return c

    # pack_photons alone (the jnp pre-pass: sort + table build)
    def run_pack(pm):
        def step(c, i):
            p = pm._replace(power=pm.power + i.astype(jnp.float32) * 1e-9)
            tbl, cb, sb, _ = pg.pack_photons(p)
            return c + jnp.sum(tbl) + jnp.sum(cb) + jnp.sum(sb), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.int32))
        return c

    print(f"pack_photons only: {timeit(run_pack, pmap):7.2f} ms", flush=True)

    base_make = pg._make_kernel
    t = timeit(run_gather, pmap, pos, nrm, elig)
    print(f"full gather      : {t:7.2f} ms", flush=True)

    # overhead floor: nothing eligible
    t = timeit(run_gather, pmap, pos, nrm, elig & False)
    print(f"elig=0 floor     : {t:7.2f} ms", flush=True)

    # walk only + visit count
    pg._make_kernel = walkonly_make_kernel(pg)
    try:
        t = timeit(run_gather, pmap, pos, nrm, elig)
        g = jax.jit(lambda: jnp.sum(
            pg.gather_pallas(pmap, pos, nrm, elig, H, W)[:, 0]) / (32 * 128))()
        visits = float(np.asarray(g))
        print(f"walk-only        : {t:7.2f} ms  total chunk visits/frame "
              f"~{visits:.0f} ({visits/510:.1f}/tile)", flush=True)
    except Exception as e:
        print(f"walk-only FAILED: {str(e)[:200]}", flush=True)
    pg._make_kernel = base_make


if __name__ == "__main__":
    main()
