"""Compare BVH walk volume: canonical scene vs standalone wine glass.

RTVS_MK_STATS=leaves reports closest-walk leaf visits through the rays
channel. Child mode renders one config; driver loops subprocesses
(the stats flag is frozen at megakernel import).

Child env: RTVS_PROBE_SCENE=canonical|standalone, RTVS_MK_STATS set by
driver. spp1 b5 1080p denoiser off.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def standalone_engine():
    import tempfile

    from raytracevs_tpu.io.mesh_cache import MeshCacheService
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData,
        SceneData,
    )
    from raytracevs_tpu.scene.transform import Transform

    ms = MeshCacheService("/root/reference/Resource/Model",
                          cache_dir=tempfile.mkdtemp())
    ms.initialize()
    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.5, -3.5])
    scene.camera.look_at = np.array([0.0, 0.9, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 5
    scene.settings.enable_denoiser = False
    mat = MaterialData(base_color=np.array([0.95, 0.95, 0.95, 1.0]),
                       transmission=1.0, ior=1.05, roughness=0.1)
    scene.objects += [
        MeshObjectData(mesh_name="WineGlass",
                       transform=Transform(scale=np.array([2.0, 2.0, 2.0])),
                       material=mat),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]),
                  intensity=10.0),
        LightData(type=LightType.AMBIENT, color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    eng = Engine(1920, 1088, mesh_service=ms)
    eng.update_scene(scene)
    return eng


def child():
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    which = os.environ.get("RTVS_PROBE_SCENE", "canonical")
    if which == "canonical":
        eng = Engine(1920, 1088)
        eng.load_rtvs("/root/reference/sample_scene.rtvs",
                      samples_per_pixel=1, max_bounces=5,
                      enable_denoiser=False)
    else:
        eng = standalone_engine()
    cfg = eng._cfg
    backend = os.environ.get("RTVS_PROBE_BACKEND") or _pick_backend(
        eng._flat, cfg)
    t0 = time.perf_counter()
    out = render_rows(eng._flat, cfg, jnp.int32(0), cfg.height,
                      backend=backend)
    stats = int(np.asarray(out.rays))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "scene": which, "stats_mode": os.environ.get("RTVS_MK_STATS", ""),
        "value": stats, "wall_s": round(dt, 1), "backend": backend,
    }), flush=True)


def main():
    combos = [("canonical", "iters", ""), ("canonical", "leaves", ""),
              ("canonical", "", ""), ("standalone", "iters", ""),
              ("canonical", "", "pallas2")]
    for scene, stats, backend in combos:
        env = dict(os.environ)
        env["RTVS_PROBE_CHILD"] = "1"
        env["RTVS_PROBE_SCENE"] = scene
        if stats:
            env["RTVS_MK_STATS"] = stats
        else:
            env.pop("RTVS_MK_STATS", None)
        if backend:
            env["RTVS_PROBE_BACKEND"] = backend
        print("RUN", scene, stats or "rays", backend or "auto", flush=True)
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=1500)
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(out[-1] if out else
              f"FAILED rc={r.returncode}\n{r.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    if os.environ.get("RTVS_PROBE_CHILD"):
        child()
    else:
        main()
