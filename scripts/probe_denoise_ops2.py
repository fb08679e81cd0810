"""TPU A/B probe #2: stencil-window stitching + shadow-kernel boundness.

Variants (carry-threaded lax.scan timing, floor-free, 4K):
  atrous v2 + halo-stitch   in-tree default after this round's change: the
                            stitched window is th+14 rows instead of 3*th.
  shadow base (stitched)    th+4-row window.
  shadow taps9              radius=1 (9 taps vs 25) — tap-count scaling.
  shadow noexp              both exp weights replaced by rational approx —
                            transcendental share (timing only, wrong values).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_denoise_ops2.py
"""
import time

import numpy as np

BATCH = 8
H, W = 2160, 3840


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


def scan_carry(fn, init, *xs):
    import jax
    import jax.numpy as jnp

    def run(c0, *args):
        def step(c, _):
            return fn(c, *args), ()
        c, _ = jax.lax.scan(step, c0, jnp.arange(BATCH))
        return jax.tree_util.tree_map(jnp.sum, c)
    return timeit(run, init, *xs)


def make_shadow_noexp(dk, jnp):
    F32 = jnp.float32

    def kernel(off, th, padx, w, radius, softness, depth_threshold, win,
               out_ref):
        sh = win[0:2]
        oid = win[2]
        vz = win[3]
        nrm = win[4:7]
        c_sh = sh[:, off : off + th, padx : padx + w]
        c_oid = oid[off : off + th, padx : padx + w]
        c_vz = vz[off : off + th, padx : padx + w]
        c_n = nrm[:, off : off + th, padx : padx + w]
        wsum = jnp.zeros((th, w), F32)
        pen_sum = jnp.zeros((th, w), F32)
        vis_sum = jnp.zeros((th, w), F32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                oy, ox = off + dy, padx + dx
                q = sh[:, oy : oy + th, ox : ox + w]
                q_oid = oid[oy : oy + th, ox : ox + w]
                q_vz = vz[oy : oy + th, ox : ox + w]
                q_n = nrm[:, oy : oy + th, ox : ox + w]
                same = q_oid == c_oid
                # rational stand-in for exp (timing probe only)
                x = jnp.abs(c_vz - q_vz) / jnp.maximum(
                    depth_threshold * c_vz, 0.001)
                w_depth = 1.0 / (1.0 + x)
                w_norm = jnp.maximum((q_n * c_n).sum(axis=0), 0.0) ** 8
                d2 = float(dx * dx + dy * dy)
                w_spatial = 1.0 / (1.0 + d2 / (2.0 * softness * softness + 0.01))
                wq = jnp.where(same, w_depth * w_norm * w_spatial, 0.0)
                pen_sum = pen_sum + q[0] * wq
                vis_sum = vis_sum + q[1] * wq
                wsum = wsum + wq
        ok = wsum > 0.001
        pen = jnp.where(ok, pen_sum / jnp.maximum(wsum, 1e-6), c_sh[0])
        vis = jnp.where(ok, vis_sum / jnp.maximum(wsum, 1e-6), c_sh[1])
        sky = c_oid < 0.0
        out_ref[:] = jnp.stack(
            [jnp.where(sky, c_sh[0], pen), jnp.where(sky, c_sh[1], vis)],
            axis=0)

    return kernel


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    vz = jnp.abs(jax.random.normal(ks[3], (H, W), jnp.float32)) * 5.0 + 0.5
    img6 = jnp.abs(jax.random.normal(ks[4], (6, H, W), jnp.float32))
    nrm = jax.random.normal(ks[5], (3, H, W), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=0, keepdims=True)
    oid = jax.random.randint(ks[6], (H, W), 0, 6, jnp.int32)
    shadow = jnp.abs(jax.random.normal(ks[7], (2, H, W), jnp.float32))

    at = dk.atrous.__wrapped__
    bf16 = jnp.bfloat16
    ms = scan_carry(lambda im, z, n: at(im, z, n, storage_dtype=bf16),
                    img6, vz, nrm)
    print(f"atrous v2 stitched: {ms:6.2f} ms", flush=True)

    sd = dk.shadow_denoise.__wrapped__
    ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n), shadow, oid, vz, nrm)
    print(f"shadow stitched:    {ms:6.2f} ms", flush=True)

    ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n, radius=1),
                    shadow, oid, vz, nrm)
    print(f"shadow taps9:       {ms:6.2f} ms", flush=True)

    real_sk = dk._shadow_kernel
    dk._shadow_kernel = make_shadow_noexp(dk, jnp)
    try:
        ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n),
                        shadow, oid, vz, nrm)
        print(f"shadow noexp:       {ms:6.2f} ms", flush=True)
    finally:
        dk._shadow_kernel = real_sk


if __name__ == "__main__":
    main()
