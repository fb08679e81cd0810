"""TPU A/B probe: denoiser kernel op-diet experiments at 4K.

Variants (each timed with a carry-threaded lax.scan, floor-free):
  reproject      baseline vs pltpu.roll ablated (identity) — attributes the
                 two full-window rolls' share of the kernel's runtime.
  atrous         fused (default) vs unfused per-pass kernels (bf16 window
                 streaming changed the DMA/compute balance since the fused
                 kernel was adopted) vs a v2 fused kernel that computes
                 progressively SHRINKING row extents per pass (pass p only
                 needs sum(strides p+1..) rows beyond the center band:
                 28+24+16 rows vs 48*3 at th=16) with the depth-weight
                 divide hoisted to one reciprocal.
  shadow         baseline vs divide-hoisted (25 per-tap divides -> 1 recip).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_denoise_ops.py
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


# --------------------------------------------------------------------------
# v2 fused a-trous: shrinking extents + hoisted reciprocals
# --------------------------------------------------------------------------
def make_atrous_v2(dk, C, jnp, pl):
    F32 = jnp.float32

    def _shift_x(a, dx):
        if dx == 0:
            return a
        return dk._shift_clamp(a, 0, dx)

    def kernel_v2(th, padx, w, passes, nch, win, out_ref):
        i = pl.program_id(0)
        nty = pl.num_programs(0)
        wp = w + 2 * padx
        kernel_w = {0: 1.0, 1: 2.0 / 3.0, 2: 1.0 / 6.0}
        img = win[0:nch]
        vz = win[nch]
        nrm = win[nch + 1 : nch + 4]
        inv_vz = 1.0 / (0.05 * jnp.maximum(vz, C.VIEWZ_MIN))

        strides = [1 << p for p in range(passes)]
        need = [sum(strides[p + 1 :]) for p in range(passes)]
        exts = [(th - n, 2 * th + n) for n in need]
        cur = img
        cur_off = 0
        for p in range(passes):
            s = strides[p]
            a, b = exts[p]
            rows = b - a
            c_img = cur[:, a - cur_off : b - cur_off]
            c_vz = vz[a:b]
            c_n = nrm[:, a:b]
            c_inv = inv_vz[a:b]
            acc = c_img
            wsum = jnp.ones((rows, wp), F32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    ry = a - cur_off + dy * s
                    q = _shift_x(cur[:, ry : ry + rows], dx * s)
                    qz = _shift_x(vz[a + dy * s : b + dy * s], dx * s)
                    qn = _shift_x(nrm[:, a + dy * s : b + dy * s], dx * s)
                    w_depth = jnp.exp(-jnp.abs(qz - c_vz) * c_inv)
                    ndot = jnp.maximum((qn * c_n).sum(axis=0), 0.0)
                    wq = w_depth * ndot ** 8 * kernel_w[max(abs(dy), abs(dx))]
                    acc = acc + q * wq[None]
                    wsum = wsum + wq
            cur = acc * (1.0 / wsum)[None]
            cur_off = a
            if p == passes - 1:
                break
            # frame-edge fixes within the next pass's reach (matches the
            # oracle's clamped reads of THIS pass's output)
            na, nb = exts[p + 1]
            rtop = th - cur_off       # index of frame row 0 in cur
            rbot = 2 * th - 1 - cur_off
            top_fix = jnp.concatenate(
                [jnp.broadcast_to(cur[:, rtop : rtop + 1], (nch, rtop, wp)),
                 cur[:, rtop:]], axis=1)
            cur = jnp.where(i == 0, top_fix, cur)
            bot_fix = jnp.concatenate(
                [cur[:, : rbot + 1],
                 jnp.broadcast_to(cur[:, rbot : rbot + 1],
                                  (nch, cur.shape[1] - rbot - 1, wp))], axis=1)
            cur = jnp.where(i == nty - 1, bot_fix, cur)
            left = jnp.broadcast_to(cur[..., padx : padx + 1],
                                    cur.shape[:-1] + (padx,))
            right = jnp.broadcast_to(cur[..., padx + w - 1 : padx + w],
                                     cur.shape[:-1] + (padx,))
            cur = jnp.concatenate([left, cur[..., padx : padx + w], right],
                                  axis=-1)
        out_ref[:] = cur[:, th - cur_off : 2 * th - cur_off, padx : padx + w]

    return kernel_v2


def make_shadow_hoisted(dk, jnp, pl):
    F32 = jnp.float32

    def kernel(th, padx, w, radius, softness, depth_threshold, win, out_ref):
        sh = win[0:2]
        oid = win[2]
        vz = win[3]
        nrm = win[4:7]
        c_sh = sh[:, th : 2 * th, padx : padx + w]
        c_oid = oid[th : 2 * th, padx : padx + w]
        c_vz = vz[th : 2 * th, padx : padx + w]
        c_n = nrm[:, th : 2 * th, padx : padx + w]
        inv_d = 1.0 / jnp.maximum(depth_threshold * c_vz, 0.001)

        wsum = jnp.zeros((th, w), F32)
        pen_sum = jnp.zeros((th, w), F32)
        vis_sum = jnp.zeros((th, w), F32)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                oy, ox = th + dy, padx + dx
                q = sh[:, oy : oy + th, ox : ox + w]
                q_oid = oid[oy : oy + th, ox : ox + w]
                q_vz = vz[oy : oy + th, ox : ox + w]
                q_n = nrm[:, oy : oy + th, ox : ox + w]
                same = q_oid == c_oid
                w_depth = jnp.exp(-jnp.abs(c_vz - q_vz) * inv_d)
                w_norm = jnp.maximum((q_n * c_n).sum(axis=0), 0.0) ** 8
                d2 = float(dx * dx + dy * dy)
                w_spatial = jnp.exp(-d2 / (2.0 * softness * softness + 0.01))
                wq = jnp.where(same, w_depth * w_norm * w_spatial, 0.0)
                pen_sum = pen_sum + q[0] * wq
                vis_sum = vis_sum + q[1] * wq
                wsum = wsum + wq
        ok = wsum > 0.001
        rw = 1.0 / jnp.maximum(wsum, 1e-6)
        pen = jnp.where(ok, pen_sum * rw, c_sh[0])
        vis = jnp.where(ok, vis_sum * rw, c_sh[1])
        sky = c_oid < 0.0
        out_ref[:] = jnp.stack(
            [jnp.where(sky, c_sh[0], pen), jnp.where(sky, c_sh[1], vis)],
            axis=0)

    return kernel


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from raytracevs_tpu import constants as C
    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    state = jnp.abs(jax.random.normal(ks[0], (16, H, W))).astype(jnp.bfloat16)
    curr = jnp.abs(jax.random.normal(ks[1], (8, H, W), jnp.float32))
    motion = jax.random.normal(ks[2], (2, H, W), jnp.float32) * 1.5
    vz = jnp.abs(jax.random.normal(ks[3], (H, W), jnp.float32)) * 5.0 + 0.5
    img6 = jnp.abs(jax.random.normal(ks[4], (6, H, W), jnp.float32))
    nrm = jax.random.normal(ks[5], (3, H, W), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=0, keepdims=True)
    oid = jax.random.randint(ks[6], (H, W), 0, 6, jnp.int32)
    shadow = jnp.abs(jax.random.normal(ks[7], (2, H, W), jnp.float32))

    rep = dk.reproject_accumulate.__wrapped__
    ms = scan_carry(lambda st, cu, mv, z: rep(st, cu, mv, z),
                    state, curr, motion, vz)
    print(f"reproject base:    {ms:6.2f} ms", flush=True)

    class _PltpuProxy:
        def __init__(self, real):
            self._real = real
        def roll(self, x, n, axis):
            return x
        def __getattr__(self, name):
            return getattr(self._real, name)

    real_pltpu = dk.pltpu
    dk.pltpu = _PltpuProxy(real_pltpu)
    try:
        ms = scan_carry(lambda st, cu, mv, z: rep(st, cu, mv, z),
                        state, curr, motion, vz)
        print(f"reproject no-roll: {ms:6.2f} ms", flush=True)
    finally:
        dk.pltpu = real_pltpu

    at = dk.atrous.__wrapped__
    bf16 = jnp.bfloat16
    ms = scan_carry(lambda im, z, n: at(im, z, n, storage_dtype=bf16),
                    img6, vz, nrm)
    print(f"atrous fused:      {ms:6.2f} ms", flush=True)

    dk._ATROUS_FUSED = False
    try:
        ms = scan_carry(lambda im, z, n: at(im, z, n, storage_dtype=bf16),
                        img6, vz, nrm)
        print(f"atrous unfused:    {ms:6.2f} ms", flush=True)
    finally:
        dk._ATROUS_FUSED = True

    real_fk = dk._atrous_fused_kernel
    dk._atrous_fused_kernel = make_atrous_v2(dk, C, jnp, pl)
    try:
        ms = scan_carry(lambda im, z, n: at(im, z, n, storage_dtype=bf16),
                        img6, vz, nrm)
        print(f"atrous fused v2:   {ms:6.2f} ms", flush=True)
    finally:
        dk._atrous_fused_kernel = real_fk

    sd = dk.shadow_denoise.__wrapped__
    ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n), shadow, oid, vz, nrm)
    print(f"shadow base:       {ms:6.2f} ms", flush=True)

    real_sk = dk._shadow_kernel
    dk._shadow_kernel = make_shadow_hoisted(dk, jnp, pl)
    try:
        ms = scan_carry(lambda s, o, z, n: sd(s, o, z, n), shadow, oid, vz, nrm)
        print(f"shadow hoisted:    {ms:6.2f} ms", flush=True)
    finally:
        dk._shadow_kernel = real_sk


if __name__ == "__main__":
    main()
