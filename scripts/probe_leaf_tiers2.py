"""TPU sweep: tiered leaf loops x leaf size on the wine glass — ONE process
(per-process tunnel cold-start is ~6 min; batch everything).

Patches megakernel._LEAF_TIERS / bvh.MK_LEAF_SIZE at runtime between
configs (both are read at trace/build time, not kernel-run time).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_leaf_tiers2.py
"""
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    # NOTE: do NOT import tests/conftest here — importing it calls
    # jax.config.update('jax_platforms', 'cpu') at module scope, which
    # silently turns a TPU probe into a CPU run (measured the hard way).
    from raytracevs_tpu.ops import bvh as bvh_mod
    from raytracevs_tpu.ops.pallas import megakernel as mk
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.runtime.engine import Engine, _pick_backend

    def wine_glass_scene():
        import tempfile

        from raytracevs_tpu.io.mesh_cache import MeshCacheService
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
        scene.settings.max_bounces = 6
        glass = MaterialData(
            base_color=np.array([0.95, 0.95, 0.95, 1.0]), transmission=1.0,
            ior=1.05, roughness=0.1,
        )
        scene.objects += [
            MeshObjectData(mesh_name="WineGlass",
                           transform=Transform(scale=np.array([2.0, 2.0, 2.0])),
                           material=glass),
            PlaneData(),
        ]
        scene.lights += [
            LightData(type=LightType.POINT,
                      position=np.array([3.0, 5.0, -3.0]), intensity=10.0),
            LightData(type=LightType.AMBIENT,
                      color=np.array([0.3, 0.3, 0.3, 1.0])),
        ]
        return scene, ms

    configs = [
        ("leaf24 flat", 24, False),
        ("leaf24 tiers", 24, True),
        ("leaf32 tiers", 32, True),
        ("leaf48 tiers", 48, True),
    ]
    for name, leaf, tiers in configs:
        bvh_mod.MK_LEAF_SIZE = leaf
        mk._LEAF_TIERS = tiers
        scene, ms_svc = wine_glass_scene()
        engine = Engine(1920, 1088, mesh_service=ms_svc, device_mesh=None)
        engine.update_scene(scene)
        backend = _pick_backend(engine._flat, engine._cfg)
        flat, cfg = engine._flat, engine._cfg

        def run(scene, start):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                out = render_rows(s_i, cfg, jnp.int32(0), cfg.height,
                                  backend=backend)
                return carry, (jnp.sum(out.color), out.rays)

            _, (cks, rays) = jax.lax.scan(step, 0, start + jnp.arange(4))
            return jnp.sum(cks), jnp.sum(rays)

        f = jax.jit(run)
        t0 = time.perf_counter()
        cks, rays = f(flat, jnp.int32(0))
        float(np.asarray(cks))
        comp = time.perf_counter() - t0
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            cks, rays = f(flat, jnp.int32(4 * (r + 1)))
            float(np.asarray(cks))
            ts.append(time.perf_counter() - t0)
        best = min(ts) / 4
        rpf = float(np.asarray(rays)) / 4
        print(f"{name}: {best*1000:.1f} ms {rpf/best/1e6:.1f} Mrays/s "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
