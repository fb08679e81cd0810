"""Round-4: re-measure the canonical scene after the slender-glass
reconstruction fix (io/mesh_cache.py _reconstruct_legacy_convention:
lateral axes now carry half the vertical scale, pinned by inverting the
scene camera projection on /root/reference/ScreenShot.png landmarks).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4_slender.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    from raytracevs_tpu.io.png import write_png
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config
    from raytracevs_tpu.utils.refcompare import compare_to_reference

    eng = Engine(1920, 1088)
    eng.load_rtvs(bench.SCENE, enable_denoiser=False)
    bk = _pick_backend(eng._flat, eng._cfg)
    s, r, fl = bench._bench_config(eng, eng._cfg, bk, 3)
    print(json.dumps({"headline_ms": round(s * 1e3, 2),
                      "headline_mrays": round(r / s / 1e6, 2), "floor": fl}),
          flush=True)

    cfg_fast = make_config(eng._scene, 1920, 1088, samples_per_pixel=1,
                           max_bounces=5, enable_denoiser=True)
    s, _r, fl = bench._bench_config(eng, cfg_fast, bk, 3)
    print(json.dumps({"fast_ms": round(s * 1e3, 2)}), flush=True)

    eng2 = Engine(1920, 1088)
    eng2.load_rtvs(bench.SCENE, enable_denoiser=True)
    img = None
    for _ in range(12):
        img = eng2.render()
    write_png("/tmp/r4_dxr_render2.png", np.asarray(img))
    c = compare_to_reference(np.asarray(img))
    print(json.dumps({"ssim_vs_dxr": c["ssim"],
                      "mean_abs_err": c["mean_abs_err"],
                      "regions": c["regions"]}), flush=True)


if __name__ == "__main__":
    main()
