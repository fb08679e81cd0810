"""TPU probe: the bench 4K fast rung with current code (CF denoiser state).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fast4k.py
"""


def main():
    from bench import _bench_config
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    for (w, h) in ((3840, 2160), (1920, 1088)):
        eng = Engine(w, h, device_mesh=None)
        eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=True,
                      samples_per_pixel=1, max_bounces=5)
        b = _pick_backend(eng._flat, eng._cfg)
        best_s, _ = _bench_config(eng, eng._cfg, b, 3)
        print(f"fast {w}x{h}: {best_s*1000:.1f} ms = {1/best_s:.2f} FPS",
              flush=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")
    main()
