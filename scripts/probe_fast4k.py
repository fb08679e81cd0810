"""TPU probe: the bench 4K fast rung — fused a-trous (raised VMEM limit)
vs the per-pass fallback, in ONE process (tunnel cold-start is minutes).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fast4k.py
"""


def run_configs(label):
    from bench import _bench_config
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    for (w, h) in ((3840, 2160), (1920, 1088)):
        eng = Engine(w, h, device_mesh=None)
        eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=True,
                      samples_per_pixel=1, max_bounces=5)
        b = _pick_backend(eng._flat, eng._cfg)
        try:
            best_s, _ = _bench_config(eng, eng._cfg, b, 3)
            print(f"[{label}] fast {w}x{h}: {best_s*1000:.1f} ms"
                  f" = {1/best_s:.2f} FPS", flush=True)
        except Exception as e:
            print(f"[{label}] fast {w}x{h}: FAILED {str(e)[:300]}", flush=True)


def main():
    from raytracevs_tpu.ops.pallas import denoise_kernels as dk

    run_configs("fused")
    dk._ATROUS_FUSED = False
    # the flag is read at trace time — drop every jit cache that inlined it
    import jax
    jax.clear_caches()
    run_configs("per-pass")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
