#!/usr/bin/env python
"""Benchmark: sample_scene.rtvs at 1080p on the available accelerator.

Prints ONE JSON line whose headline metric is the throughput on the
canonical scene:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Extra keys cover the BASELINE.md metric set:
  frame_ms / fps              headline config (scene-carried spp/bounces,
                              denoiser off: raw path-tracer throughput)
  default_frame_ms/default_fps the DEFAULT pipeline — denoiser ON
                              (scene/data.py enable_denoiser default),
                              temporal + a-trous + shadow filter included
  fast_fps / fast_frame_ms    spp=1, bounces=5 (the reference's defaults,
                              README.md:228) with the denoiser on — the
                              interactive configuration (30+ FPS target)
  fast_fps_720p / _1440p      the same config at the reference README's
                              other FPS-ladder rungs (README.md:304-307)
  mesh_mrays / mesh_frame_ms  5.9k-triangle WineGlass.fbx scene (BVH path)
  mesh_opaque_*               the same mesh opaque: BVH throughput without
                              glass path-tree divergence

Baseline: the reference RayTraceVS sustains 30-60 FPS at 1080p on an RTX
3060 with ~2-4 traced rays/pixel ~= 125-500 Mrays/s (README.md:305, see
BASELINE.md); the north-star target is >=200 Mrays/s per TPU v5e chip
(BASELINE.json). vs_baseline is measured Mrays/s divided by 200.

Timing forces the COMPLETE pipeline by fetching an on-device checksum of
the final RGBA8 image — a scalar, so the measurement reflects chip compute,
not the development tunnel's host-transfer bandwidth. (In this dev
environment the TPU is reached through a socket tunnel whose ~5 MB/s
readback would otherwise dominate; production readback is PCIe.) Each
measurement scans `batch` frames per dispatch and subtracts the separately
measured dispatch+fetch round-trip floor (`_tunnel_floor`, reported as
tunnel_floor_ms) — validated by two-point batch extrapolation in
scripts/probe_batch_floor.py.
"""
import json
import os
import sys
import time

BASELINE_MRAYS = 200.0
SCENE = os.environ.get("BENCH_SCENE", "/root/reference/sample_scene.rtvs")


def _device_watchdog() -> bool:
    """Fail fast (with an honest JSON line) instead of hanging forever when
    the TPU plugin can't reach its backend: jax.devices() blocks
    indefinitely inside PJRT init during dev-tunnel outages (observed
    2026-08-18), which would stall the whole bench run. Returns True when
    a device answered within BENCH_DEVICE_TIMEOUT_S (default 900 s —
    first tunnel contact legitimately takes minutes)."""
    import threading

    ready = threading.Event()

    def touch():
        import jax

        jax.devices()
        ready.set()

    threading.Thread(target=touch, daemon=True).start()
    if ready.wait(timeout=float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "900"))):
        return True
    print(json.dumps({
        "metric": "Mrays/s/chip on sample_scene.rtvs",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": "accelerator unreachable: jax.devices() timed out "
                 "(tunnel/PJRT init hang, not a renderer failure)",
    }))
    return False


_FLOOR_FN = None


def _tunnel_floor(reps=6):
    """Measured dispatch+fetch round-trip floor of the dev tunnel.

    A jitted scalar add + host fetch does no renderer work, so its wall
    time IS the per-measurement floor (~25 ms over the dev tunnel; ~0 on
    local hardware). Measured fresh before each config so tunnel drift
    within a long bench run doesn't skew the subtraction. Validated by a
    two-point batch extrapolation (scripts/probe_batch_floor.py): the
    fast-1080p per-frame time drops by exactly floor*(1/8 - 1/32) going
    batch 8 -> 32, i.e. the old batch-8 numbers carried ~3 ms/frame of
    pure measurement artifact.
    """
    global _FLOOR_FN
    import jax
    import jax.numpy as jnp
    import numpy as np

    if _FLOOR_FN is None:
        g = jax.jit(lambda s: s + 1.0)
        x = jnp.float32(1.0)
        float(np.asarray(g(x)))  # compile + first-contact warmup
        _FLOOR_FN = (g, x)
    g, x = _FLOOR_FN
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(g(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _bench_config(engine, cfg, backend, reps, batch=16):
    """Time the full engine pipeline (denoise included when cfg says so).

    `batch` frames run inside ONE jitted lax.scan per measurement with a
    single scalar fetch, and the separately measured dispatch+fetch floor
    (`_tunnel_floor`) is subtracted before dividing: the dev tunnel's
    round trip costs ~25 ms, which would otherwise add floor/batch
    (~1.5 ms at batch 16) to every per-frame number (production dispatch
    is local and pipelined).

    The batch adapts to the config's measured single-frame cost: a
    heavyweight config (the canonical scene's spp12 glass-mesh headline
    runs seconds per frame) inside a 16-frame scan would exceed the TPU
    runtime's execution watchdog and CRASH the worker process (observed:
    ~86 s single dispatch -> 'TPU worker process crashed'). A one-frame
    probe picks batch = clamp(20 s / frame, 1, batch) first.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracevs_tpu.runtime.engine import _render_pipeline
    from raytracevs_tpu.post import denoise as denoise_mod

    state0 = (denoise_mod.init_state_auto(cfg.height, cfg.width, backend)
              if cfg.enable_denoiser else None)
    flat = engine._flat

    def make_run(n_frames):
        def run(scene, st, start):
            def step(carry, i):
                s_i = scene._replace(frame_index=i.astype(jnp.uint32))
                # want_aux=False: only the RGBA image + ray count
                # materialize (the lane G-buffer/HDR aux surface is for
                # the editor APIs)
                rgba, _hdr, rays, _g, new_st, _dn = _render_pipeline(
                    s_i, cfg, backend, carry, False
                )
                return new_st, (jnp.sum(rgba.astype(jnp.uint32)), rays)

            st, (cks, rays) = jax.lax.scan(step, st,
                                           start + jnp.arange(n_frames))
            return jnp.sum(cks), jnp.sum(rays), st

        return jax.jit(run)

    # single-frame probe: compile + warmup, then one timed dispatch
    probe = make_run(1)
    cks, _r, _s = probe(flat, state0, jnp.int32(0))
    float(np.asarray(cks))
    t0 = time.perf_counter()
    cks, _r, _s = probe(flat, state0, jnp.int32(1))
    float(np.asarray(cks))
    est_s = max(time.perf_counter() - t0, 1e-4)
    batch = max(1, min(batch, int(20.0 / est_s)))

    if batch == 1:
        f = probe
    else:
        f = make_run(batch)
    cks, rays, state = f(flat, state0, jnp.int32(0))
    float(np.asarray(cks))  # warmup: compile + tunnel

    floor_s = _tunnel_floor()
    times = []
    ray_counts = []
    for r in range(reps):
        start = time.perf_counter()
        cks, rays, state = f(flat, state, jnp.int32((r + 1) * batch))
        float(np.asarray(cks))  # forces execution of the whole batch
        times.append(time.perf_counter() - start)
        ray_counts.append(float(np.asarray(rays)) / batch)

    # Subtract the measured per-measurement floor. Guard: never subtract
    # more than half the batch time (a floor estimate that large means the
    # tunnel glitched mid-config — report the raw division instead, and
    # say so: `subtracted` + the per-config floor travel back to the
    # caller so the JSON can't silently mix corrected and raw numbers.
    best_total = min(times)
    subtracted = floor_s < 0.5 * best_total
    if subtracted:
        best_total -= floor_s
    best_s = best_total / batch
    mean_rays = sum(ray_counts) / len(ray_counts)
    return best_s, mean_rays, {"floor_ms": round(floor_s * 1e3, 2),
                               "subtracted": subtracted}


def _big_mesh_engine(width, height, rings=316, segs=316):
    """~200k-triangle procedural sphere: exceeds the 12 MB VMEM dense-table
    budget, so _pick_backend streams triangles from HBM (pallas_hbm)."""
    import tempfile

    import numpy as np

    from raytracevs_tpu.io.mesh_cache import CachedMesh, MeshCacheService
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData, SceneData,
    )

    vs = []
    for r in range(rings + 1):
        th = np.pi * r / rings
        for s in range(segs + 1):
            ph = 2.0 * np.pi * s / segs
            n = np.array([np.sin(th) * np.cos(ph), np.cos(th),
                          np.sin(th) * np.sin(ph)])
            vs.append((0.9 * n, n))
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
    ms = MeshCacheService("/nonexistent", cache_dir=tempfile.mkdtemp())
    ms.register("BigSphere", CachedMesh(
        name="BigSphere", vertices=verts.reshape(-1),
        indices=np.asarray(idx, np.uint32),
        bounds_min=np.array([-0.9, -0.9, -0.9]),
        bounds_max=np.array([0.9, 0.9, 0.9]),
    ))
    scene = SceneData()
    scene.camera.position = np.array([0.0, 1.2, -3.0])
    scene.camera.look_at = np.array([0.0, 0.8, 0.0])
    scene.settings.samples_per_pixel = 1
    scene.settings.max_bounces = 6
    scene.settings.enable_denoiser = False
    scene.objects += [
        MeshObjectData(mesh_name="BigSphere",
                       material=MaterialData(
                           base_color=np.array([0.8, 0.5, 0.3, 1.0]),
                           roughness=0.5)),
        PlaneData(),
    ]
    scene.lights += [
        LightData(type=LightType.POINT, position=np.array([3.0, 5.0, -3.0]),
                  intensity=10.0),
        LightData(type=LightType.AMBIENT,
                  color=np.array([0.3, 0.3, 0.3, 1.0])),
    ]
    engine = Engine(width, height, mesh_service=ms)
    engine.update_scene(scene)
    return engine


def _ssim_proxy(res=256) -> float:
    """Cross-backend SSIM: compiled megakernel vs the portable jnp oracle on
    the sample scene's ANALYTIC subset — the cross-backend parity stand-in
    next to ssim_vs_dxr. The FBX nodes are filtered here because the jnp
    oracle's mesh path is gather-bound: a 256^2 oracle render of the
    mesh-bearing scene exceeds the TPU execution watchdog and CRASHES the
    worker (observed round 4), killing every later bench section. Mesh
    cross-backend parity is covered at small shapes in
    tests/test_megakernel.py / tests/test_big_mesh.py instead."""
    import copy

    import numpy as np
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import tonemap as tonemap_mod
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.scene.data import MeshObjectData
    from raytracevs_tpu.utils.ssim import ssim

    engine = Engine(res, res)
    engine.load_rtvs(SCENE, samples_per_pixel=2, max_bounces=6,
                     enable_denoiser=False)
    scene_an = copy.deepcopy(engine._scene)
    scene_an.objects = [o for o in scene_an.objects
                        if not isinstance(o, MeshObjectData)]
    engine.update_scene(scene_an, samples_per_pixel=2, max_bounces=6,
                        enable_denoiser=False)
    flat, cfg = engine._flat, engine._cfg

    def frame(backend):
        out = render_rows(flat, cfg, jnp.int32(0), cfg.height, backend=backend)
        color01 = composite_mod.composite(
            out.gbuffer, out.raw_specular, flat.exposure,
            flat.tone_map_operator, flat.gamma, use_denoised=False,
        )
        return np.asarray(tonemap_mod.to_rgba8(color01)).reshape(res, res, 4)

    return ssim(frame("pallas"), frame("jnp"))


def _ssim_mesh_proxy(res=128, chunk=16) -> float:
    """Cross-backend SSIM on the MESH path (VERDICT r4 weak #4): compiled
    megakernel vs the portable jnp oracle on the FULL mesh-bearing
    canonical scene at 128^2 / spp 1 / bounces 4. The oracle renders in
    `chunk`-row slabs across separate dispatches so no single dispatch
    approaches the TPU execution watchdog (the round-4 crash was one
    256^2 spp2 b6 oracle dispatch — this is ~100x less work per
    dispatch). Composite is pixel-local with use_denoised=False, so
    per-chunk composition concatenates exactly."""
    import numpy as np
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import tonemap as tonemap_mod
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.utils.ssim import ssim

    engine = Engine(res, res)
    engine.load_rtvs(SCENE, samples_per_pixel=1, max_bounces=4,
                     enable_denoiser=False)
    flat, cfg = engine._flat, engine._cfg

    def rgba(gbuffer, raw_specular, rows):
        color01 = composite_mod.composite(
            gbuffer, raw_specular, flat.exposure,
            flat.tone_map_operator, flat.gamma, use_denoised=False,
        )
        return np.asarray(tonemap_mod.to_rgba8(color01)).reshape(
            rows, res, 4)

    out_p = render_rows(flat, cfg, jnp.int32(0), res, backend="pallas")
    img_p = rgba(out_p.gbuffer, out_p.raw_specular, res)
    parts = []
    for r0 in range(0, res, chunk):
        o = render_rows(flat, cfg, jnp.int32(r0), chunk, backend="jnp")
        parts.append(rgba(o.gbuffer, o.raw_specular, chunk))
    img_j = np.concatenate(parts, axis=0)
    return ssim(img_p, img_j)


def _mesh_engine(width, height, material="glass"):
    import tempfile

    import numpy as np

    from raytracevs_tpu.io.mesh_cache import MeshCacheService
    from raytracevs_tpu.runtime.engine import Engine
    from raytracevs_tpu.scene.data import (
        LightData, LightType, MaterialData, MeshObjectData, PlaneData, SceneData,
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
    scene.settings.enable_denoiser = False
    if material == "glass":
        mat = MaterialData(base_color=np.array([0.95, 0.95, 0.95, 1.0]),
                           transmission=1.0, ior=1.05, roughness=0.1)
    else:  # opaque: pure BVH traversal throughput (no specular path trees)
        mat = MaterialData(base_color=np.array([0.85, 0.85, 0.9, 1.0]),
                           roughness=0.4)
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
    engine = Engine(width, height, mesh_service=ms)
    engine.update_scene(scene)
    return engine


def main():
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1088))  # tile-aligned 1080p
    frames = int(os.environ.get("BENCH_FRAMES", 4))

    if not _device_watchdog():
        return 1

    from raytracevs_tpu.runtime.engine import Engine, _pick_backend
    from raytracevs_tpu.scene.flatten import make_config

    # Per-config floor bookkeeping (every timing subtracts its own freshly
    # measured tunnel floor; configs where the guard suppressed subtraction
    # are listed in `floor_unsubtracted` so raw and corrected numbers are
    # never indistinguishable in one JSON line).
    floors = {}

    def bench_cfg(tag, engine, cfg, backend, reps):
        best_s, rays, fl = _bench_config(engine, cfg, backend, reps)
        floors[tag] = fl
        return best_s, rays

    # 1) headline: scene-carried settings, denoiser off (raw throughput)
    engine = Engine(width, height)
    engine.load_rtvs(SCENE, enable_denoiser=False)
    backend = _pick_backend(engine._flat, engine._cfg)
    best_s, mean_rays = bench_cfg("headline", engine, engine._cfg, backend,
                                  frames)
    mrays = mean_rays / best_s / 1e6

    result = {
        "metric": f"Mrays/s/chip on sample_scene.rtvs @{width}x{height}",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "frame_ms": round(best_s * 1000.0, 2),
        "fps": round(1.0 / best_s, 2),
        "rays_per_frame": int(mean_rays),
        "spp": engine._cfg.samples_per_pixel,
        "max_bounces": engine._cfg.max_bounces,
        "backend": backend,
        "tunnel_floor_ms": round(_tunnel_floor() * 1000.0, 2),
    }

    # 1b) analytic-only continuity key: the same scene-carried config on the
    # scene MINUS its FBX meshes — the composition every pre-round-4 bench
    # measured (the mesh service wasn't wired into the defaults then), kept
    # as a secondary so round-over-round numbers stay comparable. The
    # headline above is the TRUE canonical scene including the wine glass.
    try:
        import copy as _copy

        from raytracevs_tpu.scene.data import MeshObjectData

        scene_an = _copy.deepcopy(engine._scene)
        scene_an.objects = [o for o in scene_an.objects
                            if not isinstance(o, MeshObjectData)]
        eng_an = Engine(width, height)
        eng_an.update_scene(scene_an, enable_denoiser=False)
        b_an = _pick_backend(eng_an._flat, eng_an._cfg)
        best_s, an_rays = bench_cfg("headline_analytic", eng_an, eng_an._cfg,
                                    b_an, frames)
        result["headline_analytic_mrays"] = round(an_rays / best_s / 1e6, 3)
        result["headline_analytic_frame_ms"] = round(best_s * 1000.0, 2)
    except Exception as e:
        result["headline_analytic_error"] = str(e)[:120]

    # 2) DEFAULT pipeline: denoiser ON (the data.py default) — full frame
    cfg_def = make_config(engine._scene, width, height, enable_denoiser=True)
    best_s, _ = bench_cfg("default", engine, cfg_def, backend, frames)
    result["default_frame_ms"] = round(best_s * 1000.0, 2)
    result["default_fps"] = round(1.0 / best_s, 2)

    # 3) interactive config: reference defaults spp=1 bounces=5, denoiser on
    cfg_fast = make_config(engine._scene, width, height, samples_per_pixel=1,
                           max_bounces=5, enable_denoiser=True)
    best_s, fast_rays = bench_cfg("fast", engine, cfg_fast, backend, frames)
    result["fast_frame_ms"] = round(best_s * 1000.0, 2)
    result["fast_fps"] = round(1.0 / best_s, 2)
    result["fast_mrays"] = round(fast_rays / best_s / 1e6, 3)

    # 3b) resolution scaling of the interactive config — BASELINE.md's FPS
    # table rows (README.md:304-307: 60+ @720p, 30-60 @1080p, 15-30 @1440p,
    # 10-30 @2160p)
    for label, (rw, rh) in (("720p", (1280, 720)), ("1440p", (2560, 1440)),
                            ("4k", (3840, 2160))):
        eng_r = Engine(rw, rh)
        eng_r.load_rtvs(SCENE, enable_denoiser=True, samples_per_pixel=1,
                        max_bounces=5)
        b_r = _pick_backend(eng_r._flat, eng_r._cfg)
        best_s, _ = bench_cfg(f"fast_{label}", eng_r, eng_r._cfg, b_r,
                              max(2, frames // 2))
        result[f"fast_fps_{label}"] = round(1.0 / best_s, 2)

    # 3c) caustics: the photon pass at the reference's own budget for this
    # scene (DXRPipeline.cpp:3604-3633 TDR caps) AND at the reference's
    # global 131,072-photon safe cap (DXRPipeline.h:483-487). Reported as
    # the full frame time with the photon pass on, plus the delta vs the
    # same config with it off.
    try:
        from raytracevs_tpu.ops.photon import photon_budget

        base_cfg = make_config(engine._scene, width, height,
                               samples_per_pixel=1, max_bounces=5,
                               enable_denoiser=False)
        ref_budget = photon_budget(engine._scene)
        best_off, _ = bench_cfg("caustics_off", engine, base_cfg, backend,
                                max(2, frames // 2))
        for tag, n_ph in (("", ref_budget), ("_max", 131072)):
            if n_ph <= 0:
                continue
            cfg_c = make_config(engine._scene, width, height,
                                samples_per_pixel=1, max_bounces=5,
                                enable_denoiser=False, num_photons=n_ph)
            best_s, _ = bench_cfg(f"caustics{tag}", engine, cfg_c, backend,
                                  max(2, frames // 2))
            result[f"caustics{tag}_photons"] = n_ph
            result[f"caustics{tag}_frame_ms"] = round(best_s * 1000.0, 2)
            result[f"caustics{tag}_delta_ms"] = round(
                (best_s - best_off) * 1000.0, 2)
    except Exception as e:
        result["caustics_error"] = str(e)[:120]

    # 3e) SSIM vs the reference's OWN DXR render (BASELINE.json "SSIM vs
    # DXR ref"): /root/reference/ScreenShot.png is the reference engine's
    # 1920x1080 ground-truth render of this very scene. Render the
    # scene-carried config with the denoiser ON, accumulate frames
    # (static camera — the screenshot is temporally converged), compare on
    # the reference pixel grid (utils/refcompare.py handles the 1088-row
    # FOV warp). Discrepancy analysis: docs/PARITY.md.
    try:
        import numpy as _np

        from raytracevs_tpu.utils.refcompare import compare_to_reference

        eng_d = Engine(width, height)
        eng_d.load_rtvs(SCENE, enable_denoiser=True)
        img = None
        for _ in range(12):
            img = eng_d.render()
        cmp_res = compare_to_reference(_np.asarray(img))
        result["ssim_vs_dxr"] = cmp_res["ssim"]
        result["ssim_vs_dxr_worst_region"] = min(cmp_res["regions"].values())
        # full 4x4 region map for the discrepancy analysis (VERDICT r4 #2)
        result["ssim_vs_dxr_regions"] = cmp_res["regions"]
        result["ssim_vs_dxr_mae"] = cmp_res["mean_abs_err"]
    except Exception as e:
        result["ssim_vs_dxr_error"] = str(e)[:120]

    # 4) mesh scene (BVH traversal path)
    try:
        mesh_engine = _mesh_engine(width, height)
        mesh_backend = _pick_backend(mesh_engine._flat, mesh_engine._cfg)
        best_s, mesh_rays = bench_cfg("mesh", mesh_engine, mesh_engine._cfg,
                                      mesh_backend, frames)
        result["mesh_mrays"] = round(mesh_rays / best_s / 1e6, 3)
        result["mesh_frame_ms"] = round(best_s * 1000.0, 2)
        # 4b) opaque mesh: BVH traversal throughput without the glass
        # path-tree divergence (primary + shadow walks only)
        op_engine = _mesh_engine(width, height, material="opaque")
        op_backend = _pick_backend(op_engine._flat, op_engine._cfg)
        best_s, op_rays = bench_cfg("mesh_opaque", op_engine, op_engine._cfg,
                                    op_backend, frames)
        result["mesh_opaque_mrays"] = round(op_rays / best_s / 1e6, 3)
        result["mesh_opaque_frame_ms"] = round(best_s * 1000.0, 2)
    except Exception as e:  # mesh assets absent: keep the headline metric
        result["mesh_error"] = str(e)[:120]

    # 4c) big mesh beyond the VMEM cap: HBM-streamed triangle tables
    # (backend pallas_hbm) — the no-BLAS-size-cap parity entry
    # (AccelerationStructure.cpp:560-663 has no cap; neither do we now)
    try:
        big_engine = _big_mesh_engine(width, height)
        big_backend = _pick_backend(big_engine._flat, big_engine._cfg)
        best_s, big_rays = bench_cfg("hbm_mesh", big_engine, big_engine._cfg,
                                     big_backend, max(2, frames // 2))
        result["hbm_mesh_tris"] = int(big_engine._flat.mesh.mk_num_tris)
        result["hbm_mesh_backend"] = big_backend
        result["hbm_mesh_mrays"] = round(big_rays / best_s / 1e6, 3)
        result["hbm_mesh_frame_ms"] = round(best_s * 1000.0, 2)
    except Exception as e:
        result["hbm_mesh_error"] = str(e)[:120]

    # last) SSIM proxy (BASELINE.json metric set): megakernel vs the portable
    # jnp oracle, analytic subset at 256x256 — runs LAST because the oracle
    # dispatch is the section that crashed the TPU worker in round 4 (see
    # _ssim_proxy docstring); a repeat can no longer take other sections out.
    try:
        result["ssim_vs_oracle"] = round(_ssim_proxy(), 4)
    except Exception as e:
        result["ssim_error"] = str(e)[:120]

    # mesh-path cross-backend parity (row-chunked oracle — watchdog-safe)
    try:
        result["ssim_vs_oracle_mesh"] = round(_ssim_mesh_proxy(), 4)
    except Exception as e:
        result["ssim_mesh_error"] = str(e)[:120]

    unsub = sorted(t for t, fl in floors.items() if not fl["subtracted"])
    if unsub:
        result["floor_unsubtracted"] = unsub
    result["floors_ms"] = {t: fl["floor_ms"] for t, fl in floors.items()}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
