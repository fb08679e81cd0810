"""Round-5 probe: two-phase regrouping (RTVS_TWOPHASE=1, backend
"pallas2") on the CANONICAL scene fast config — the one untested
combination left. Round 2 falsified two-phase on the STANDALONE wine
glass (regrouping repartitions walks without cutting leaf visits), but
the canonical scene is different: 89% of its frame is glass-subtree
iterations whose continuations mix sky/analytic/mesh directions, and
with root-AABB preculling now in place, coherence-sorted continuation
tiles whose rays all miss the glass can skip mesh walks WHOLESALE."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    out = {}
    for two in ("0", "1"):
        os.environ["RTVS_TWOPHASE"] = two
        import jax
        jax.clear_caches()
        eng = Engine(1920, 1088)
        eng.load_rtvs("/root/reference/sample_scene.rtvs",
                      enable_denoiser=False)
        eng.update_scene(eng._scene, samples_per_pixel=1, max_bounces=5,
                         enable_denoiser=False)
        cfg = eng._cfg
        backend = _pick_backend(eng._flat, cfg)
        s, rays, meta = bench._bench_config(eng, cfg, backend, reps=3,
                                            batch=4)
        out[f"fast_tp{two}_backend"] = backend
        out[f"fast_tp{two}_ms"] = round(s * 1e3, 2)
        out[f"fast_tp{two}_mrays"] = round(rays / s / 1e6, 1)
        print(json.dumps({k: v for k, v in out.items() if f"tp{two}" in k}),
              flush=True)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
