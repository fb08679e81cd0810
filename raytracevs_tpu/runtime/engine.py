"""Engine: the user-facing render runtime.

Plays the role of EngineWrapper + DXRPipeline orchestration
(src/RayTraceVS.Interop/EngineWrapper.h:18-58,
src/RayTraceVS.DXEngine/NativeBridge.h:120-154): create with a resolution,
push scenes into it, pull RGBA8 frames out. jit dispatch replaces command
lists and fences; the persistent compilation cache replaces the shader
cache (ShaderCache.cpp).

Example:
    engine = Engine(512, 512)
    engine.update_scene(scene_data)      # evaluated SceneData
    img = engine.render()                # np.uint8 [H, W, 4]
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..post import composite as composite_mod
from ..post import tonemap
from ..scene.data import SceneData
from ..scene.evaluator import evaluate_scene
from ..scene.flatten import FlatScene, RenderConfig, flatten_scene, make_config
from ..scene.rtvs import load_graph
from ..scene.sanitize import sanitize_scene
from ..ops.render import render_frame
from ..utils.checksum import scene_data_checksum


@partial(jax.jit, static_argnums=(1, 2))
def _render_pipeline(scene: FlatScene, cfg: RenderConfig, backend: str, denoise_state):
    """Full frame: wavefront render -> denoise -> composite -> RGBA8."""
    from ..ops.render import render_rows
    from ..post import denoise as denoise_mod

    out = render_rows(scene, cfg, jnp.int32(0), cfg.height, backend=backend)
    if cfg.enable_denoiser and denoise_state is not None:
        dd, ds, _dshadow, new_state = denoise_mod.denoise_frame(
            out.gbuffer, cfg.height, cfg.width, denoise_state
        )
        color01 = composite_mod.composite(
            out.gbuffer,
            out.raw_specular,
            scene.exposure,
            scene.tone_map_operator,
            scene.gamma,
            denoised_diffuse=dd,
            denoised_specular=ds,
            use_denoised=True,
            nrd_bypass_distance=scene.nrd_bypass_distance,
            nrd_bypass_blend=scene.nrd_bypass_blend,
        )
    else:
        new_state = denoise_state
        color01 = composite_mod.composite(
            out.gbuffer,
            out.raw_specular,
            scene.exposure,
            scene.tone_map_operator,
            scene.gamma,
            use_denoised=False,
        )
    rgba = tonemap.to_rgba8(color01).reshape(cfg.height, cfg.width, 4)
    hdr = out.color.reshape(cfg.height, cfg.width, 3)
    return rgba, hdr, out.rays, out.gbuffer, new_state


def _pick_backend(flat: FlatScene) -> str:
    """Megakernel on real TPUs; jnp on CPU and for meshes too big for VMEM.

    Mesh scenes use in-kernel packet BVH traversal; the node/triangle
    tables live in VMEM, so very large meshes (tables beyond ~6 MB) fall
    back to the jnp wavefront.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "cpu":
        return "jnp"
    if flat.mesh is not None:
        mesh_bytes = flat.mesh.num_nodes * (8 + 4) * 4 + flat.mesh.num_tris * 24 * 4
        if mesh_bytes > 6 * 1024 * 1024:
            return "jnp"
    return "pallas"


class Engine:
    """Render engine with EngineWrapper-compatible surface."""

    def __init__(self, width: int, height: int, mesh_service=None, backend: str = "auto"):
        self.width = int(width)
        self.height = int(height)
        self.mesh_service = mesh_service
        self.backend = backend  # "auto" | "jnp" | "pallas"
        self._flat: Optional[FlatScene] = None
        self._cfg: Optional[RenderConfig] = None
        self._scene: Optional[SceneData] = None
        self._frame_index = 0
        self._checksum = None
        self._last_rgba: Optional[np.ndarray] = None
        self._last_hdr: Optional[np.ndarray] = None
        self._last_rays = 0
        self._last_render_ms = 0.0
        self._prev_view_proj = None
        self._denoise_state = None

    # -- scene input ------------------------------------------------------
    def update_scene(self, scene: SceneData, **config_overrides) -> None:
        """Sanitize + flatten a SceneData (EngineWrapper::UpdateScene)."""
        clean = sanitize_scene(scene)
        self._scene = clean
        aspect = self.width / self.height
        new_checksum = scene_data_checksum(clean)
        if new_checksum != self._checksum:
            # Scene changed: reset temporal history (DXRPipeline.cpp:2854-2880).
            self._frame_index = 0
            self._prev_view_proj = None
            self._denoise_state = None
        self._checksum = new_checksum
        self._flat = flatten_scene(
            clean, frame_index=self._frame_index, aspect=aspect,
            prev_view_proj=self._prev_view_proj, mesh_service=self.mesh_service,
        )
        self._cfg = make_config(clean, self.width, self.height, **config_overrides)
        self._prev_view_proj = np.asarray(self._flat.view_proj)

    def load_rtvs(self, path: str, **config_overrides) -> None:
        """Convenience: load a .rtvs file and update the scene.

        FBX mesh names resolve against Resource/Model next to the scene file
        (the reference scans the application's Resource/Model directory,
        MeshCacheService.cs:54-72); FBX nodes whose mesh is missing from the
        cache are dropped at load (SceneFileService.cs:52-62).
        """
        import os

        if self.mesh_service is None:
            scene_dir = os.path.dirname(os.path.abspath(path))
            for candidate in (
                os.path.join(scene_dir, "Resource", "Model"),
                os.path.join(scene_dir, "Model"),
            ):
                if os.path.isdir(candidate):
                    from ..io.mesh_cache import MeshCacheService

                    svc = MeshCacheService(candidate, cache_dir=os.path.join(
                        os.path.expanduser("~"), ".raytracevs_tpu", "meshcache"))
                    try:
                        svc.initialize()
                        self.mesh_service = svc
                    except OSError:
                        pass
                    break
        resolver = self.mesh_service.get_mesh if self.mesh_service is not None else None
        graph = load_graph(path, mesh_resolver=resolver)
        self.update_scene(evaluate_scene(graph), **config_overrides)

    # -- rendering --------------------------------------------------------
    def _sentinel(self, rgb) -> np.ndarray:
        """Color-coded failure fill (NativeBridge.cpp:266-356)."""
        img = np.zeros((self.height, self.width, 4), np.uint8)
        img[..., 0], img[..., 1], img[..., 2], img[..., 3] = (*rgb, 255)
        return img

    def render(self, fail_safe: bool = False) -> np.ndarray:
        """Render a frame; returns RGBA8 np.uint8 [H, W, 4] (readback analog).

        With fail_safe=True, failures return the reference's color-coded
        sentinel fills instead of raising: magenta = exception during
        render, orange = all-zero output (NativeBridge.cpp:266-356).
        """
        if fail_safe:
            try:
                img = self.render(fail_safe=False)
            except Exception:
                from ..utils.logging import log_error

                log_error("render failed; returning magenta sentinel")
                return self._sentinel((255, 0, 255))
            if not img[..., :3].any():
                return self._sentinel((255, 165, 0))
            return img
        if self._flat is None:
            raise RuntimeError("update_scene() must be called before render()")
        backend = self.backend if self.backend != "auto" else _pick_backend(self._flat)
        if self._cfg.enable_denoiser and self._denoise_state is None:
            from ..post import denoise as denoise_mod

            self._denoise_state = denoise_mod.init_state(self.height, self.width)
        start = time.perf_counter()
        rgba, hdr, rays, _, self._denoise_state = _render_pipeline(
            self._flat, self._cfg, backend, self._denoise_state
        )
        rgba = np.asarray(rgba)
        self._last_render_ms = (time.perf_counter() - start) * 1000.0
        self._last_rgba = rgba
        self._last_hdr = np.asarray(hdr)
        self._last_rays = int(rays)
        self._frame_index += 1
        self._flat = self._flat._replace(
            frame_index=jnp.asarray(self._frame_index, jnp.uint32)
        )
        return rgba

    def get_pixel_data(self) -> bytes:
        """Raw RGBA bytes of the last frame (EngineWrapper::GetPixelData)."""
        if self._last_rgba is None:
            raise RuntimeError("render() must be called before get_pixel_data()")
        return self._last_rgba.tobytes()

    # -- metrics ----------------------------------------------------------
    @property
    def last_render_ms(self) -> float:
        return self._last_render_ms

    @property
    def last_rays(self) -> int:
        """Rays traced in the last frame (TraceRay-equivalents)."""
        return self._last_rays

    @property
    def last_mrays_per_s(self) -> float:
        if self._last_render_ms <= 0:
            return 0.0
        return self._last_rays / (self._last_render_ms * 1e-3) / 1e6


def render_rtvs(path: str, width: int = 512, height: int = 512, **overrides) -> np.ndarray:
    """One-shot: render a .rtvs scene file to an RGBA8 array."""
    engine = Engine(width, height)
    engine.load_rtvs(path, **overrides)
    return engine.render()
