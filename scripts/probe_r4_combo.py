"""Bisect why the canonical scene (analytic + reconstructed WineGlass2)
runs ~7x slower than the standalone wine-glass scene at the same config.

Child mode (RTVS_PROBE_CHILD=1): renders the canonical scene at 1080p
spp1 b5 denoiser-off with the inherited RTVS_MK_DISABLE, prints one line.
Driver mode: loops configs, one subprocess each (the disable set is
frozen at megakernel import).

Extra child knobs:
  RTVS_PROBE_OPAQUE=1   force the glass mesh material opaque
  RTVS_PROBE_MESH_ONLY=1  drop the analytic prims (mesh + plane only)
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
    from raytracevs_tpu.scene.flatten import flatten_scene, make_config

    eng = Engine(1920, 1088)
    eng.load_rtvs("/root/reference/sample_scene.rtvs", enable_denoiser=False)
    scene = eng._scene
    if os.environ.get("RTVS_PROBE_OPAQUE"):
        for o in scene.objects:
            if type(o).__name__ == "MeshObjectData":
                o.material.transmission = 0.0
                o.material.roughness = 0.4
    if os.environ.get("RTVS_PROBE_MESH_ONLY"):
        scene.objects = [o for o in scene.objects
                         if type(o).__name__ in ("MeshObjectData", "PlaneData")]
    eng.update_scene(scene, samples_per_pixel=1, max_bounces=5,
                     enable_denoiser=False)
    cfg = eng._cfg
    backend = _pick_backend(eng._flat, cfg)
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
    # floor
    g = jax.jit(lambda s: s + 1.0)
    float(np.asarray(g(jnp.float32(0))))
    fl = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(np.asarray(g(jnp.float32(0))))
        fl.append(time.perf_counter() - t0)
    floor = min(fl)
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
        "disable": os.environ.get("RTVS_MK_DISABLE", ""),
        "opaque": bool(os.environ.get("RTVS_PROBE_OPAQUE")),
        "mesh_only": bool(os.environ.get("RTVS_PROBE_MESH_ONLY")),
        "frame_ms": round(best / batch * 1e3, 2),
        "rays": int(np.asarray(rays)) // batch,
    }), flush=True)


def main():
    configs = [
        {},
        {"RTVS_MK_DISABLE": "shadow2"},
        {"RTVS_MK_DISABLE": "mesh_thick"},
        {"RTVS_MK_DISABLE": "mesh_shadow"},
        {"RTVS_MK_DISABLE": "mesh_closest,mesh_shadow,mesh_thick"},
        {"RTVS_MK_DISABLE": "gspawn"},
        {"RTVS_MK_DISABLE": "shadow"},
        {"RTVS_PROBE_OPAQUE": "1"},
        {"RTVS_PROBE_MESH_ONLY": "1"},
    ]
    if os.environ.get("RTVS_PROBE_ONLY"):
        # semicolon list of RTVS_MK_DISABLE values; "" = baseline,
        # OPAQUE / MESH_ONLY select the scene-variant configs
        want = os.environ["RTVS_PROBE_ONLY"].split(";")

        def key(c):
            if "RTVS_PROBE_OPAQUE" in c:
                return "OPAQUE"
            if "RTVS_PROBE_MESH_ONLY" in c:
                return "MESH_ONLY"
            return c.get("RTVS_MK_DISABLE", "")

        configs = [c for c in configs if key(c) in want]
    for cfg in configs:
        env = dict(os.environ)
        env.update(cfg)
        env["RTVS_PROBE_CHILD"] = "1"
        print("RUN", cfg, flush=True)
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=1500)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else f"FAILED rc={r.returncode}\n{r.stderr[-2000:]}",
              flush=True)


if __name__ == "__main__":
    if os.environ.get("RTVS_PROBE_CHILD"):
        child()
    else:
        main()
