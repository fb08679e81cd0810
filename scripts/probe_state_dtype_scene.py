"""TPU probe: bf16 denoiser history on the REAL sample scene.

Runs the full fast-config pipeline (spp=1 b=5, denoiser on) for 8 frames
with the CF history state in f32 vs bf16, then compares the final RGBA8
frames (max LSB diff + SSIM) and reports the frame time for both. This is
the quality gate for flipping the RTVS_STATE_DTYPE default.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_state_dtype_scene.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.post import denoise as denoise_mod
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend, _render_pipeline
    from raytracevs_tpu.utils.ssim import ssim

    batch = 8
    for W, H in ((1920, 1088), (3840, 2160)):
        engine = Engine(W, H)
        engine.load_rtvs("/root/reference/sample_scene.rtvs",
                         samples_per_pixel=1, max_bounces=5,
                         enable_denoiser=True)
        flat, cfg = engine._flat, engine._cfg
        backend = _pick_backend(flat, cfg)

        def run(scene, st):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                rgba, _h, _r, _g, new_st, _d = _render_pipeline(
                    s_i, cfg, backend, carry, False)
                return new_st, rgba

            st2, frames = jax.lax.scan(step, st, jnp.arange(batch))
            return frames[-1], jnp.sum(frames[-1].astype(jnp.uint32))

        f = jax.jit(run)
        outs = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            st0 = denoise_mod.init_state_cf(cfg.height, cfg.width, dtype=dt)
            last, cks = f(flat, st0)
            float(np.asarray(cks))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                _, cks = f(flat, st0)
                float(np.asarray(cks))
                ts.append(time.perf_counter() - t0)
            outs[name] = np.asarray(last).reshape(H, W, 4)
            print(f"[{W}x{H}] {name}: {min(ts)/batch*1000:.2f} ms/frame "
                  f"({batch/min(ts):.1f} FPS)", flush=True)
        d = np.abs(outs["f32"].astype(np.int32) - outs["bf16"].astype(np.int32))
        s = ssim(outs["f32"], outs["bf16"])
        print(f"[{W}x{H}] frame8 diff: max={d.max()} LSB, "
              f">1LSB at {(d > 1).mean()*100:.4f}% px, ssim={s:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
