"""TPU probe: where do the 6.1 us/leaf-visit go?

Hypothesis: the megakernel's leaf loop pays not just the ~26 plane-test
vector ops per (lane,tri) but also ~22 scalar extract+splat ops per tri
(_tg reads of the loaded [16,128] leaf window, which lives in vregs).
Measured pure-issue floor is ~2.6 us/visit (24 tris x ~56 [32,128] ops
x 4 cycles @940MHz) vs 6.1 us measured -> ~2.3x unexplained.

Three kernels run the same 24-tri closest-hit leaf test over a [32,128]
ray tile, ITERS times:
  A "extract": fields via static extracts from a VMEM-loaded [16,128]
               window + pltpu.roll per visit (the megakernel's layout)
  B "smem":    fields via scalar loads from an SMEM-resident [16,128]
               table (scalar operands broadcast into vector ops)
  C "const":   fields are compile-time Python floats (pure-compute floor;
               table loads DCE'd)

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_leaf_issue.py
"""
import time
from functools import partial

import numpy as np

ITERS = 512
NTRI = 24


def _test_body(o, d, best_t, field, exfield, lh):
    """One 24-tri closest leaf visit, megakernel-shaped (test + epilogue)."""
    import jax.numpy as jnp

    nx = best_t * 0.0
    ny = nx
    nz = nx
    gdot = nx
    for k in range(NTRI):
        nx_, ny_, nz_ = field(k, 0), field(k, 1), field(k, 2)
        nd = d[0] * nx_ + d[1] * ny_ + d[2] * nz_
        no = o[0] * nx_ + o[1] * ny_ + o[2] * nz_
        ok = jnp.abs(nd) > 1e-9
        t = (field(k, 3) - no) / jnp.where(ok, nd, 1.0)
        hx = o[0] + t * d[0]
        hy = o[1] + t * d[1]
        hz = o[2] + t * d[2]
        u = field(k, 7) + hx * field(k, 4) + hy * field(k, 5) + hz * field(k, 6)
        v = field(k, 11) + hx * field(k, 8) + hy * field(k, 9) + hz * field(k, 10)
        th = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 1e-3) & (t <= best_t)
        th = th & (lh != 0)
        better = th & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        tw = 1.0 - u - v
        nx = jnp.where(better, exfield(k, 0) * tw + exfield(k, 3) * u + exfield(k, 6) * v, nx)
        ny = jnp.where(better, exfield(k, 1) * tw + exfield(k, 4) * u + exfield(k, 7) * v, ny)
        nz = jnp.where(better, exfield(k, 2) * tw + exfield(k, 5) * u + exfield(k, 8) * v, nz)
        gdot = jnp.where(better, nd, gdot)
    return best_t + 1e-7 * (nx + ny + nz + gdot)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (32, 128)

    def mk_kernel(mode):
        def kernel(geo_ref, ex_ref, o_ref, d_ref, out_ref):
            o = (o_ref[0], o_ref[1], o_ref[2])
            d = (d_ref[0], d_ref[1], d_ref[2])
            lh = (o[0] * 0).astype(jnp.int32) + 1

            def body(i, best_t):
                if mode == "extract":
                    g = geo_ref[...]
                    g = pltpu.roll(g, (16 - (i & 7)) % 16, axis=0)
                    ex = ex_ref[...]
                    ex = pltpu.roll(ex, (16 - (i & 7)) % 16, axis=0)

                    def field(k, j):
                        return g[k >> 3, (k & 7) * 12 + j]

                    def exfield(k, j):
                        return ex[k >> 3, (k & 7) * 12 + j]
                elif mode == "smem":
                    # dynamic row base (i&7) defeats hoisting, mimics a
                    # per-visit leaf offset; scalar loads from SMEM
                    def field(k, j, _r=geo_ref):
                        return _r[((i & 7) + (k >> 3)) % 16, (k & 7) * 12 + j]

                    def exfield(k, j, _r=ex_ref):
                        return _r[((i & 7) + (k >> 3)) % 16, (k & 7) * 12 + j]
                else:  # const
                    rng = np.random.RandomState(0)
                    cg = rng.uniform(-1, 1, (16, 128)).astype(np.float32)
                    ce = rng.uniform(-1, 1, (16, 128)).astype(np.float32)

                    def field(k, j):
                        return float(cg[k >> 3, (k & 7) * 12 + j])

                    def exfield(k, j):
                        return float(ce[k >> 3, (k & 7) * 12 + j])

                return _test_body(o, d, best_t, field, exfield, lh)

            best0 = o_ref[0] * 0 + 1e9
            out_ref[0] = jax.lax.fori_loop(0, ITERS, body, best0)

        return kernel

    def run(mode):
        geo_space = pltpu.SMEM if mode == "smem" else pltpu.ANY
        if mode == "smem":
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((3,) + shape, lambda: (0, 0, 0)),
                pl.BlockSpec((3,) + shape, lambda: (0, 0, 0)),
            ]
        else:
            in_specs = [
                pl.BlockSpec((16, 128), lambda: (0, 0)),
                pl.BlockSpec((16, 128), lambda: (0, 0)),
                pl.BlockSpec((3,) + shape, lambda: (0, 0, 0)),
                pl.BlockSpec((3,) + shape, lambda: (0, 0, 0)),
            ]
        fn = pl.pallas_call(
            mk_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((1,) + shape, jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1,) + shape, lambda: (0, 0, 0)),
        )
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        geo = jax.random.uniform(ks[0], (16, 128), jnp.float32, -1, 1)
        ex = jax.random.uniform(ks[1], (16, 128), jnp.float32, -1, 1)
        o = jax.random.uniform(ks[2], (3,) + shape, jnp.float32, -1, 1)
        d = jax.random.uniform(ks[3], (3,) + shape, jnp.float32, 0.1, 1)

        @jax.jit
        def many(geo, ex, o, d):
            def step(c, _):
                r = fn(geo, ex, o + c * 1e-6, d)
                return c + 1.0, jnp.sum(r)

            _, s = jax.lax.scan(step, 0.0, None, length=16)
            return jnp.sum(s)

        s = many(geo, ex, o, d)
        float(np.asarray(s))  # compile+warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(many(geo, ex, o, d)))
            ts.append(time.perf_counter() - t0)
        # 16 kernel calls x ITERS visits per measurement
        per_visit_us = min(ts) / (16 * ITERS) * 1e6
        print(f"[{mode}] {per_visit_us:.3f} us/leaf-visit "
              f"(total {min(ts)*1000:.1f} ms)", flush=True)

    for mode in ("const", "extract", "smem"):
        try:
            run(mode)
        except Exception as e:
            print(f"[{mode}] FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
