"""Run the full 256x256 cross-backend parity sweep and record the SSIMs.

Produces PARITY_r{N}.json at the repo root — the nightly-sweep artifact the
round-2 verdict asked for (weak #2): proof the strongest parity evidence
actually ran, with per-config scores.

    python scripts/run_parity_sweep.py [round_number]
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else "03"
    import numpy as np
    import jax.numpy as jnp

    from test_golden import CONFIGS, _engine_for
    from raytracevs_tpu import Engine
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import tonemap
    from raytracevs_tpu.utils.ssim import ssim

    res = 256
    results = {}
    for config_name in CONFIGS:
        t0 = time.time()
        if config_name == "config0_sample_scene":
            engine = Engine(res, res, device_mesh=None)
            engine.load_rtvs("/root/reference/sample_scene.rtvs",
                             samples_per_pixel=2, max_bounces=6)
        else:
            engine = _engine_for(config_name, res=res)
        flat, cfg = engine._flat, engine._cfg

        def frame(backend, interpret=False):
            out = render_rows(flat, cfg, jnp.int32(0), cfg.height,
                              backend=backend, interpret=interpret)
            color01 = composite_mod.composite(
                out.gbuffer, out.raw_specular, flat.exposure,
                flat.tone_map_operator, flat.gamma, use_denoised=False,
            )
            rgba = np.asarray(tonemap.to_rgba8(color01)).reshape(res, res, 4)
            return rgba, float(np.asarray(out.rays))

        ref, rays_ref = frame("jnp")
        pal, rays_pal = frame("pallas", interpret=True)
        score = ssim(pal, ref)
        results[config_name] = {
            "ssim": round(float(score), 5),
            "rays_jnp": int(rays_ref),
            "rays_pallas": int(rays_pal),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"{config_name}: ssim={score:.5f} "
              f"rays {rays_pal:.0f}/{rays_ref:.0f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    out = {
        "resolution": res,
        "note": "pallas megakernel (interpret) vs jnp oracle, "
                "denoiser off, full BASELINE config sweep",
        "configs": results,
        "min_ssim": min(r["ssim"] for r in results.values()),
    }
    path = f"/root/repo/PARITY_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
