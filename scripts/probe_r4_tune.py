"""Re-tune tile height / leaf size on the canonical (more divergent)
glass scene + properly timed pallas2. spp1 b5 1080p denoiser off.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def child():
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.runtime.engine import Engine, _render_pipeline, _pick_backend
    eng = Engine(1920, 1088)
    eng.load_rtvs("/root/reference/sample_scene.rtvs", samples_per_pixel=1,
                  max_bounces=5, enable_denoiser=False)
    cfg = eng._cfg
    backend = os.environ.get("RTVS_PROBE_BACKEND") or _pick_backend(
        eng._flat, cfg)
    flat = eng._flat
    batch = 4

    def run(s, start):
        def step(_, i):
            s_i = s._replace(frame_index=i.astype(jnp.uint32))
            rgba, _h, rays, _g, _st, _d = _render_pipeline(
                s_i, cfg, backend, None, False)
            return None, (jnp.sum(rgba.astype(jnp.uint32)), rays)

        _, (cks, rays) = jax.lax.scan(step, None, start + jnp.arange(batch))
        return jnp.sum(cks), jnp.sum(rays)

    f = jax.jit(run)
    cks, rays = f(flat, jnp.int32(0))
    float(np.asarray(cks))
    g = jax.jit(lambda s: s + 1.0)
    float(np.asarray(g(jnp.float32(0))))
    fls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(g(jnp.float32(0))))
        fls.append(time.perf_counter() - t0)
    floor = min(fls)
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        cks, rays = f(flat, jnp.int32((r + 1) * batch))
        float(np.asarray(cks))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    if floor < 0.5 * best:
        best -= floor
    print(json.dumps({
        "tile_h": os.environ.get("RTVS_MK_TILE_H", "32"),
        "leaf": os.environ.get("RTVS_MK_LEAF_SIZE", "24"),
        "backend": backend,
        "frame_ms": round(best / batch * 1e3, 2),
        "rays": int(np.asarray(rays)) // batch,
    }), flush=True)


def main():
    configs = [
        {},                                        # baseline 32/24
        {"RTVS_MK_TILE_H": "16"},
        {"RTVS_MK_LEAF_SIZE": "16"},
        {"RTVS_MK_TILE_H": "16", "RTVS_MK_LEAF_SIZE": "16"},
        {"RTVS_PROBE_BACKEND": "pallas2", "RTVS_TWOPHASE": "1"},
    ]
    for cfgd in configs:
        env = dict(os.environ)
        env.update(cfgd)
        env["RTVS_PROBE_CHILD"] = "1"
        print("RUN", cfgd or "baseline", flush=True)
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=2400)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else
              f"FAILED rc={r.returncode}\n{r.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    if os.environ.get("RTVS_PROBE_CHILD"):
        child()
    else:
        main()
