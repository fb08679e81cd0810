"""TPU probe: photon gather after the payload-sort pack + scalar SMEM walk.

Old numbers (probe_gather2, 131k, 1080p): pack 10.6 ms, full 24.5 ms,
elig=0 floor ~0.9 ms. Targets: pack ~<2 ms, full <10 ms.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather3.py
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


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices(), flush=True)
    import jax.numpy as jnp

    from raytracevs_tpu.ops import photon as photon_mod
    from raytracevs_tpu.ops.pallas import megakernel
    from raytracevs_tpu.ops.pallas import photon_gather as pg
    from raytracevs_tpu.ops.render_cf import _planes_to_lanes3
    from raytracevs_tpu.runtime.engine import Engine

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

    print("compiling render+emit...", flush=True)
    acc, pmap = mk(flat)
    (acc, pmap) = jax.tree_util.tree_map(lambda a: a.block_until_ready(),
                                         (acc, pmap))
    print("render+emit done", flush=True)
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

    def run_pack(pm):
        def step(c, i):
            p = pm._replace(power=pm.power + i.astype(jnp.float32) * 1e-9)
            tbl, cb, sb, _ = pg.pack_photons(p)
            return c + jnp.sum(tbl) + jnp.sum(cb) + jnp.sum(sb), None

        c, _ = jax.lax.scan(step, 0.0, jnp.arange(BATCH, dtype=jnp.int32))
        return c

    print(f"pack_photons only: {timeit(run_pack, pmap):7.2f} ms", flush=True)
    print(f"full gather      : {timeit(run_gather, pmap, pos, nrm, elig):7.2f} ms",
          flush=True)
    print(f"elig=0 floor     : {timeit(run_gather, pmap, pos, nrm, elig & False):7.2f} ms",
          flush=True)

    # correctness spot check vs the portable hash walk on the real chip
    ref = np.asarray(photon_mod.gather(pmap, pos[:2048], nrm[:2048]))
    print("jnp oracle slice ok, mean", float(ref.mean()), flush=True)
