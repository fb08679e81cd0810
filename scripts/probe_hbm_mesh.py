"""TPU probe: HBM-streamed mesh tables vs VMEM-resident, at several sizes.

Run on the real chip (background, >=10 min timeout):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_hbm_mesh.py
"""
import sys
import tempfile
import time

import numpy as np


def uv_sphere(rings, segs, radius=0.9):
    vs = []
    for r in range(rings + 1):
        th = np.pi * r / rings
        for s in range(segs + 1):
            ph = 2.0 * np.pi * s / segs
            n = np.array([np.sin(th) * np.cos(ph), np.cos(th),
                          np.sin(th) * np.sin(ph)])
            vs.append((radius * n, n))
    verts = np.zeros((len(vs), 8), np.float32)
    for i, (p, n) in enumerate(vs):
        verts[i, 0:3] = p
        verts[i, 4:7] = n
    idx = []
    for r in range(rings):
        for s in range(segs):
            a = r * (segs + 1) + s
            b = a + segs + 1
            idx += [a, b, a + 1, a + 1, b, b + 1]
    return verts.reshape(-1), np.asarray(idx, np.uint32)


def build(rings, segs, glass):
    from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData, SceneData,
    )
    from raytracevs_tpu.scene.flatten import flatten_scene, make_config

    verts, indices = uv_sphere(rings, segs)
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("S", CachedMesh(
        name="S", vertices=verts, indices=indices,
        bounds_min=np.array([-0.9, -0.9, -0.9]),
        bounds_max=np.array([0.9, 0.9, 0.9]),
    ))
    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.8, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 6
    scene.settings.enable_denoiser = False
    if glass:
        mat = MaterialData(base_color=np.array([0.95, 0.95, 0.95, 1.0]),
                           transmission=1.0, ior=1.05, roughness=0.1)
    else:
        mat = MaterialData(base_color=np.array([0.8, 0.5, 0.3, 1.0]),
                           roughness=0.5)
    scene.objects += [MeshObjectData(mesh_name="S", material=mat), PlaneData()]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]),
                  intensity=10.0),
        LightData(type=LightType.AMBIENT, color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    W, H = 1920, 1088
    flat = flatten_scene(scene, aspect=W / H, mesh_service=ms)
    cfg = make_config(scene, W, H)
    return flat, cfg


def bench(flat, cfg, backend, reps=3, batch=4):
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows

    def run(scene, start):
        def step(carry, i):
            s_i = scene._replace(frame_index=i.astype(jnp.uint32))
            out = render_rows(s_i, cfg, jnp.int32(0), cfg.height, backend=backend)
            return carry, (jnp.sum(out.color), out.rays)

        _, (cks, rays) = jax.lax.scan(step, 0, start + jnp.arange(batch))
        return jnp.sum(cks), jnp.sum(rays)

    f = jax.jit(run)
    t0 = time.perf_counter()
    cks, rays = f(flat, jnp.int32(0))
    float(np.asarray(cks))
    compile_s = time.perf_counter() - t0
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        cks, rays = f(flat, jnp.int32((r + 1) * batch))
        float(np.asarray(cks))
        times.append(time.perf_counter() - t0)
    best = min(times) / batch
    rpf = float(np.asarray(rays)) / batch
    return best * 1000, rpf / best / 1e6, compile_s


def main():
    from raytracevs_tpu.ops.pallas.megakernel import mesh_table_bytes

    # (rings, segs) -> tri counts: 55x55=6050? rings*segs*2.
    cases = [
        ("60k", 173, 173, False),   # ~59.9k tris: resident vs hbm comparison
        ("60k", 173, 173, True),
        ("200k", 316, 316, False),  # ~199.7k tris: beyond the VMEM cap
        ("200k", 316, 316, True),
    ]
    for label, rings, segs, glass in cases:
        flat, cfg = build(rings, segs, glass)
        nt = int(flat.mesh.mk_num_tris)
        nn = int(flat.mesh.mk_num_nodes)
        mb = mesh_table_bytes(nn, nt) / 2**20
        node_mb = nn * 512 / 2**20
        tag = f"{label} {'glass' if glass else 'opaque'} tris={nt} nodes={nn} tables={mb:.1f}MB nodes={node_mb:.1f}MB"
        backends = ["pallas_hbm"]
        if mb <= 12.5:
            backends.insert(0, "pallas")
        for b in backends:
            try:
                ms_f, mrays, comp = bench(flat, cfg, b)
                print(f"{tag} [{b}]: {ms_f:.1f} ms/frame, {mrays:.1f} Mrays/s "
                      f"(compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"{tag} [{b}]: FAILED {type(e).__name__}: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    sys.exit(main())
