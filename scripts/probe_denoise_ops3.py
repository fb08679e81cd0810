"""TPU A/B probe #3: fused-atrous window stitch alignment + bf16 shadow.

  atrous halo=None/7/8   one process, same data — settles the stitch question
                         (probe2 measured stitched halo=7 worse cross-process).
  shadow f32 (base)      current production kernel.
  shadow bf16 split-oid  window streamed bf16 with obj_id split into three
                         <256 planes (bf16-exact): 9ch x 2B vs 7ch x 4B.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_denoise_ops3.py
"""
import functools
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


def make_shadow_bf16(dk, jnp):
    """shadow window as 9ch bf16: [0:2 shadow, 2:5 oid hi/mid/lo, 5 vz,
    6:9 normal]; compute f32 (cast rides the window astype in _windowed_call,
    which is already f32 — the bf16 is in the DMA'd blocks)."""
    F32 = jnp.float32

    def kernel(off, th, padx, w, radius, softness, depth_threshold, win,
               out_ref):
        sh = win[0:2]
        o_hi, o_mid, o_lo = win[2], win[3], win[4]
        vz = win[5]
        nrm = win[6:9]
        c_sh = sh[:, off : off + th, padx : padx + w]
        c_hi = o_hi[off : off + th, padx : padx + w]
        c_mid = o_mid[off : off + th, padx : padx + w]
        c_lo = o_lo[off : off + th, padx : padx + w]
        c_vz = vz[off : off + th, padx : padx + w]
        c_n = nrm[:, off : off + th, padx : padx + w]
        wsum = jnp.zeros((th, w), F32)
        pen_sum = jnp.zeros((th, w), F32)
        vis_sum = jnp.zeros((th, w), F32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                oy, ox = off + dy, padx + dx
                q = sh[:, oy : oy + th, ox : ox + w]
                same = (
                    (o_hi[oy : oy + th, ox : ox + w] == c_hi)
                    & (o_mid[oy : oy + th, ox : ox + w] == c_mid)
                    & (o_lo[oy : oy + th, ox : ox + w] == c_lo)
                )
                q_vz = vz[oy : oy + th, ox : ox + w]
                q_n = nrm[:, oy : oy + th, ox : ox + w]
                w_depth = jnp.exp(
                    -jnp.abs(c_vz - q_vz)
                    / jnp.maximum(depth_threshold * c_vz, 0.001))
                w_norm = jnp.maximum((q_n * c_n).sum(axis=0), 0.0) ** 8
                d2 = float(dx * dx + dy * dy)
                w_spatial = jnp.exp(-d2 / (2.0 * softness * softness + 0.01))
                wq = jnp.where(same, w_depth * w_norm * w_spatial, 0.0)
                pen_sum = pen_sum + q[0] * wq
                vis_sum = vis_sum + q[1] * wq
                wsum = wsum + wq
        ok = wsum > 0.001
        pen = jnp.where(ok, pen_sum / jnp.maximum(wsum, 1e-6), c_sh[0])
        vis = jnp.where(ok, vis_sum / jnp.maximum(wsum, 1e-6), c_sh[1])
        sky = c_hi >= 255.0  # sentinel plane value for oid < 0
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
    real_wc = dk._windowed_call

    for forced in (7, None, 8):
        def wc(kernel, nch_in, nch_out, packed, interpret, _f=forced, **kw):
            kw["halo"] = _f
            return real_wc(kernel, nch_in, nch_out, packed, interpret, **kw)
        dk._windowed_call = wc
        try:
            ms = scan_carry(lambda im, z, n: at(im, z, n, storage_dtype=bf16),
                            img6, vz, nrm)
            print(f"atrous halo={str(forced):4}: {ms:6.2f} ms", flush=True)
        finally:
            dk._windowed_call = real_wc

    sd = dk.shadow_denoise.__wrapped__
    ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n), shadow, oid, vz, nrm)
    print(f"shadow f32 base:  {ms:6.2f} ms", flush=True)

    # bf16 split-oid variant: own packing + kernel through _windowed_call
    kernel9 = make_shadow_bf16(dk, jnp)

    def shadow_bf16(shadow, obj_id, view_z, normal):
        safe = jnp.where(obj_id < 0, jnp.int32(0x00FF0000), obj_id)
        hi = jnp.where(obj_id < 0, 255, safe >> 16).astype(jnp.float32)
        mid = ((safe >> 8) & 255).astype(jnp.float32)
        lo = (safe & 255).astype(jnp.float32)
        packed = jnp.concatenate(
            [shadow, hi[None], mid[None], lo[None], view_z[None], normal],
            axis=0).astype(jnp.bfloat16)

        def kernel(off, th, padx, w, win, o):
            return kernel9(off, th, padx, w, 2, 1.0, 0.1, win, o)

        return real_wc(kernel, 9, 2, packed, False,
                       vmem_limit_bytes=100 << 20, bpe=700, halo=2)

    ms = scan_carry(lambda s, o, z, n: shadow_bf16(s, o, z, n),
                    shadow, oid, vz, nrm)
    print(f"shadow bf16 9ch:  {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
