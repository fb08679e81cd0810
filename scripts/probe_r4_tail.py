"""Round-4 tail validation: the bench sections downstream of the TPU worker
crash (ssim_vs_dxr, ssim proxy, mesh config), run standalone after the
_ssim_proxy analytic-subset fix. Also writes /tmp/r4_dxr_render.png for the
visual side of the DXR discrepancy analysis (docs/PARITY.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4_tail.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    from raytracevs_tpu.io.png import write_png
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.utils.refcompare import compare_to_reference

    # 1) ssim_vs_dxr: scene-carried config, denoiser on, 12 accumulated
    # frames (static camera; the reference screenshot is converged)
    eng = Engine(1920, 1088)
    eng.load_rtvs(bench.SCENE, enable_denoiser=True)
    img = None
    for i in range(12):
        t0 = time.perf_counter()
        img = eng.render()
        print(f"frame {i}: {time.perf_counter() - t0:.1f}s", flush=True)
    write_png("/tmp/r4_dxr_render.png", np.asarray(img))
    cmp_res = compare_to_reference(np.asarray(img))
    print(json.dumps({"ssim_vs_dxr": cmp_res["ssim"],
                      "mean_abs_err": cmp_res["mean_abs_err"],
                      "regions": cmp_res["regions"]}), flush=True)

    # 2) cross-backend proxy (analytic subset — the crash-site fix)
    print(json.dumps({"ssim_vs_oracle": round(bench._ssim_proxy(), 4)}),
          flush=True)

    # 3) mesh glass config, 2 reps (was unreachable after the crash)
    eng2 = bench._mesh_engine(1920, 1088)
    b2 = _pick_backend(eng2._flat, eng2._cfg)
    s, r, fl = bench._bench_config(eng2, eng2._cfg, b2, 2)
    print(json.dumps({"mesh_frame_ms": round(s * 1e3, 2),
                      "mesh_mrays": round(r / s / 1e6, 1),
                      "floor": fl}), flush=True)


if __name__ == "__main__":
    main()
