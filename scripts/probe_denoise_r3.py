"""TPU probe: per-stage denoiser kernel times at 1080p and 4K.

Times reproject_accumulate / fused atrous / shadow_denoise / full
denoise_frame_cf, each lax.scan-batched with a scalar fetch (floor-free).
Each stage's output feeds back into the next iteration's input — a scan
step that ignores its carry gets hoisted out of the loop by XLA and times
ONE dispatch + the tunnel floor (observed: every stage "measures" ~3-4 ms).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_denoise_r3.py
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

    from raytracevs_tpu.ops import render_cf
    from raytracevs_tpu.ops.pallas import denoise_kernels as dk
    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    engine = Engine(W, H)
    engine.load_rtvs(SCENE, enable_denoiser=True, samples_per_pixel=1,
                     max_bounces=5)
    flat, cfg = engine._flat, engine._cfg
    backend = _pick_backend(flat, cfg)

    out = jax.jit(lambda s: render_cf.render_rows_cf(
        s, cfg, jnp.int32(0), H, backend=backend))(flat)
    g = out.gbuffer
    state = denoise_mod.init_state_cf(H, W)
    print(f"[{label}] tiles={dk._tile_sizes(H, W)} "
          f"state_dtype={state.packed.dtype}", flush=True)

    curr = jnp.concatenate([g.diffuse_hitdist, g.specular_hitdist], axis=0)
    img6 = jnp.concatenate([g.diffuse_hitdist[0:3], g.specular_hitdist[0:3]],
                           axis=0)

    def scan_carry(fn, init, *xs):
        """Scan where fn(carry, *xs) -> next carry (same pytree shape)."""
        def run(c0, *args):
            def step(c, _):
                return fn(c, *args), ()
            c, _ = jax.lax.scan(step, c0, jnp.arange(BATCH))
            return jax.tree_util.tree_map(jnp.sum, c)
        return timeit(run, init, *xs)

    ms = scan_carry(
        lambda st, cu, mv, vz: dk.reproject_accumulate(st, cu, mv, vz),
        state.packed, curr, g.motion, g.view_z)
    print(f"[{label}] reproject: {ms:6.2f} ms", flush=True)

    sd = None if state.packed.dtype == jnp.float32 else state.packed.dtype
    ms = scan_carry(
        lambda im, vz, nr: dk.atrous(im, vz, nr, storage_dtype=sd),
        img6, g.view_z, g.normal_roughness[0:3])
    print(f"[{label}] atrous(fused x3): {ms:6.2f} ms", flush=True)

    ms = scan_carry(
        lambda sh, oi, vz, nr: dk.shadow_denoise(sh, oi, vz, nr),
        g.shadow_data, g.obj_id, g.view_z, g.normal_roughness[0:3])
    print(f"[{label}] shadow: {ms:6.2f} ms", flush=True)

    ms = scan_carry(
        lambda st, gg: denoise_frame_state(denoise_mod, gg, st), state, g)
    print(f"[{label}] denoise_frame_cf total: {ms:6.2f} ms", flush=True)


def denoise_frame_state(denoise_mod, gg, st):
    return denoise_mod.denoise_frame_cf(gg, st)[3]


def main():
    probe_res(1920, 1088, "1080p")
    probe_res(3840, 2160, "4k")


if __name__ == "__main__":
    main()
