"""Multi-chip rendering: image-row sharding over a device mesh.

The reference's only parallel axis is the pixel grid (DispatchRays(W,H,1),
DXRPipeline.cpp:2932-2937); its TPU-native scaling story is SPMD over image
tiles: shard the pixel rows across chips with `shard_map` over an ICI mesh,
replicate the (small) scene arrays on every chip, and let the output stay
sharded (or all-gather it at composite). No DCN collectives are needed —
rays are embarrassingly parallel and the only shared data is the scene.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.render import FrameOutput, render_rows
from ..scene.flatten import FlatScene, RenderConfig

TILE_AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis name 'tiles'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (TILE_AXIS,))


def _sharded_photon_map(scene_rep, cfg, n_dev: int, backend: str,
                        interpret: bool = False):
    """Photon-axis parallelism (SURVEY §2.5): each device emits+traces
    total/n_dev photons of the GLOBAL batch (every per-photon seed is
    keyed on the global index, so slices compose bit-exactly —
    ops/photon.py trace_photon_slice), the store arrays all_gather back
    in index order over ICI, and the sort-based hash build runs
    replicated. The resulting PhotonMap is identical to the
    single-device one, at 1/n_dev the trace cost per chip. Returns None
    (caller's render builds the map replicated) when caustics are off or
    the count doesn't divide evenly."""
    if cfg.num_photons <= 0 or cfg.num_photons % n_dev != 0:
        return None
    from ..ops import photon as photon_mod

    per = cfg.num_photons // n_dev
    i = jax.lax.axis_index(TILE_AXIS)
    stores = photon_mod.trace_photon_slice(
        scene_rep, cfg.num_photons, i * per, per,
        backend=backend, interpret=interpret)
    gathered = [jax.lax.all_gather(s, TILE_AXIS, axis=0, tiled=True)
                for s in stores]
    return photon_mod.build_photon_hash(*gathered)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _render_sharded(scene: FlatScene, cfg: RenderConfig, mesh: Mesh,
                    backend: str = "jnp") -> FrameOutput:
    n_dev = mesh.devices.size
    rows_per = cfg.height // n_dev

    def shard_fn(scene_rep):
        i = jax.lax.axis_index(TILE_AXIS)
        out = render_rows(scene_rep, cfg, i * rows_per, rows_per, backend=backend,
                          pmap=_sharded_photon_map(scene_rep, cfg, n_dev, backend))
        # scalar ray count -> [1] so it can carry a sharded axis
        return out._replace(rays=out.rays.reshape(1))

    specs_in = jax.tree_util.tree_map(lambda _: P(), scene)
    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(specs_in,),
        out_specs=FrameOutput(
            color=P(TILE_AXIS),
            gbuffer=_gbuffer_spec(),
            rays=P(TILE_AXIS),
            raw_specular=P(TILE_AXIS),
        ),
        # Loop carries mix device-invariant scene constants with per-tile
        # varying state; skip the static varying-axes check (values are
        # correct — each shard computes its own rows independently).
        check_vma=False,
    )(scene)
    return out


def _gbuffer_spec():
    from ..ops.render import GBuffer

    return GBuffer(
        diffuse_hitdist=P(TILE_AXIS),
        specular_hitdist=P(TILE_AXIS),
        normal_roughness=P(TILE_AXIS),
        view_z=P(TILE_AXIS),
        motion=P(TILE_AXIS),
        albedo=P(TILE_AXIS),
        shadow_data=P(TILE_AXIS),
        shadow_translucency=P(TILE_AXIS),
        obj_id=P(TILE_AXIS),
        motion_spec=P(TILE_AXIS),
    )


def render_frame_sharded(scene: FlatScene, cfg: RenderConfig, mesh: Optional[Mesh] = None,
                         backend: str = "auto"):
    """Render a frame with rows sharded across the mesh devices.

    `cfg.height` must divide evenly by the device count. Returns a
    FrameOutput whose arrays are jax.Arrays sharded over the mesh
    (scalar `rays` is per-shard, shape [n_dev]). backend="auto" runs the
    Pallas megakernel per device on TPU meshes and the portable jnp
    wavefront elsewhere; each shard's row slab must be a multiple of the
    32-row tile height for the megakernel.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if cfg.height % n_dev != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n_dev} devices")
    if backend == "auto":
        is_tpu = all(d.platform == "tpu" for d in mesh.devices.flat)
        rows_per = cfg.height // n_dev
        backend = "pallas" if (is_tpu and rows_per % 32 == 0) else "jnp"
    return _render_sharded(scene, cfg, mesh, backend)


@partial(jax.jit, static_argnums=(1, 2, 3, 5, 6))
def _render_pipeline_sharded(scene: FlatScene, cfg: RenderConfig, mesh: Mesh,
                             backend: str, denoise_state,
                             interpret: bool = False, want_aux: bool = True):
    """Full frame pipeline under shard_map: render + denoise (halo-row
    collectives) + composite, rows sharded over the mesh.

    The engine-facing analog of runtime.engine._render_pipeline — same
    return contract — with every stage executing per-device: the denoiser
    exchanges TEMPORAL_HALO/SPATIAL_HALO boundary rows over ICI
    (post/denoise.py::denoise_frame_sharded) and the composite/tonemap are
    per-pixel. Output equals the single-device pipeline bit-for-bit.
    """
    from ..post import composite as composite_mod
    from ..post import denoise as denoise_mod
    from ..post import tonemap

    n_dev = mesh.devices.size
    rows_per = cfg.height // n_dev

    def sharded_photon_map(scene_rep):
        return _sharded_photon_map(scene_rep, cfg, n_dev, backend, interpret)

    # Channel-first per-shard path: megakernel planes -> Pallas denoise
    # kernels with halo collectives -> composite, mirroring the
    # single-device CF pipeline (runtime.engine._render_pipeline_cf).
    # Mirrors the single-device gate (runtime.engine._render_pipeline):
    # denoiser-off pallas frames also stay channel-first — routing them
    # through the lane shard path would re-pay the [N,c] interleave the CF
    # pipeline exists to remove (~23 ms at 4K).
    use_cf = (backend in ("pallas", "pallas_hbm")
              and ((not cfg.enable_denoiser and denoise_state is None)
                   or (isinstance(denoise_state, denoise_mod.DenoiserStateCF)
                       and denoise_mod.sharded_cf_supported(rows_per,
                                                            cfg.width))))

    def shard_fn_cf(scene_rep, state_slab):
        from ..ops.render_cf import lane_gbuffer_from_cf, render_rows_cf

        i = jax.lax.axis_index(TILE_AXIS)
        out = render_rows_cf(scene_rep, cfg, i * rows_per, rows_per,
                             backend=backend, interpret=interpret,
                             pmap=sharded_photon_map(scene_rep))
        if cfg.enable_denoiser and state_slab is not None:
            dd, ds, dsh, new_state = denoise_mod.denoise_frame_sharded_cf(
                out.gbuffer, state_slab, TILE_AXIS, n_dev, cfg.height,
                interpret=interpret)
            color01 = composite_mod.composite_cf(
                out.gbuffer, out.raw_specular, scene_rep.exposure,
                scene_rep.tone_map_operator, scene_rep.gamma,
                denoised_diffuse=dd, denoised_specular=ds, use_denoised=True,
                nrd_bypass_distance=scene_rep.nrd_bypass_distance,
                nrd_bypass_blend=scene_rep.nrd_bypass_blend,
            )

            def ln(a):
                return a.transpose(1, 2, 0).reshape(-1, a.shape[0])

            denoised = (ln(dd), ln(ds), ln(dsh)) if want_aux else None
        else:
            new_state = state_slab
            denoised = None
            color01 = composite_mod.composite_cf(
                out.gbuffer, out.raw_specular, scene_rep.exposure,
                scene_rep.tone_map_operator, scene_rep.gamma,
                use_denoised=False,
            )
        rgba = tonemap.to_rgba8_cf(color01)
        if not want_aux:
            # streaming/bench contract: only the image + ray count
            # materialize — skip the lane-G-buffer/HDR interleave the CF
            # path exists to avoid (engine._render_pipeline_cf analog)
            return rgba, None, out.rays.reshape(1), None, new_state, None
        hdr = out.color.transpose(1, 2, 0)
        return (rgba, hdr, out.rays.reshape(1),
                lane_gbuffer_from_cf(out.gbuffer), new_state, denoised)

    def shard_fn(scene_rep, state_slab):
        i = jax.lax.axis_index(TILE_AXIS)
        out = render_rows(scene_rep, cfg, i * rows_per, rows_per,
                          backend=backend, interpret=interpret,
                          pmap=sharded_photon_map(scene_rep))
        if cfg.enable_denoiser and state_slab is not None:
            dd, ds, dshadow, new_state = denoise_mod.denoise_frame_sharded(
                out.gbuffer, rows_per, cfg.width, state_slab,
                TILE_AXIS, n_dev, cfg.height,
            )
            denoised = (dd, ds, dshadow)
            color01 = composite_mod.composite(
                out.gbuffer, out.raw_specular, scene_rep.exposure,
                scene_rep.tone_map_operator, scene_rep.gamma,
                denoised_diffuse=dd, denoised_specular=ds, use_denoised=True,
                nrd_bypass_distance=scene_rep.nrd_bypass_distance,
                nrd_bypass_blend=scene_rep.nrd_bypass_blend,
            )
        else:
            new_state = state_slab
            denoised = None
            color01 = composite_mod.composite(
                out.gbuffer, out.raw_specular, scene_rep.exposure,
                scene_rep.tone_map_operator, scene_rep.gamma,
                use_denoised=False,
            )
        rgba = tonemap.to_rgba8(color01).reshape(rows_per, cfg.width, 4)
        if not want_aux:
            # same contract as shard_fn_cf (the lane aux is cheap here, but
            # the output pytree must match the shared out_specs)
            return rgba, None, out.rays.reshape(1), None, new_state, None
        hdr = out.color.reshape(rows_per, cfg.width, 3)
        return (rgba, hdr, out.rays.reshape(1), out.gbuffer,
                new_state, denoised)

    sharded = P(TILE_AXIS)
    if denoise_state is None:
        state_specs = None
    elif isinstance(denoise_state, denoise_mod.DenoiserStateCF):
        # packed history is [16, H, W]: rows are axis 1
        state_specs = denoise_mod.DenoiserStateCF(packed=P(None, TILE_AXIS))
    else:
        state_specs = jax.tree_util.tree_map(lambda _: sharded, denoise_state)
    denoised_specs = ((sharded, sharded, sharded)
                      if (want_aux and cfg.enable_denoiser
                          and denoise_state is not None)
                      else None)
    specs_in = jax.tree_util.tree_map(lambda _: P(), scene)
    gb = _gbuffer_spec() if want_aux else None
    hdr_spec = sharded if want_aux else None
    return shard_map(
        shard_fn_cf if use_cf else shard_fn,
        mesh=mesh,
        in_specs=(specs_in, state_specs),
        out_specs=(sharded, hdr_spec, sharded, gb, state_specs,
                   denoised_specs),
        check_vma=False,
    )(scene, denoise_state)


def render_pipeline_sharded(scene: FlatScene, cfg: RenderConfig,
                            mesh: Optional[Mesh] = None, denoise_state=None,
                            backend: str = "auto", interpret: bool = False,
                            want_aux: bool = True):
    """Engine-level multi-chip frame: returns (rgba[H,W,4]u8, hdr[H,W,3],
    rays[n_dev], gbuffer, new_state, denoised) with rows sharded.

    cfg.height must divide by the device count; the megakernel additionally
    needs 32-row-aligned shards (backend='auto' falls back to jnp
    otherwise). `want_aux=False` (streaming/bench) skips the hdr/gbuffer/
    denoised aux outputs — None in those slots — avoiding the per-shard
    lane-interleave of surfaces nobody reads.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    if cfg.height % n_dev != 0:
        raise ValueError(f"height {cfg.height} not divisible by {n_dev} devices")
    rows_per = cfg.height // n_dev
    if backend == "auto":
        is_tpu = all(d.platform == "tpu" for d in mesh.devices.flat)
        backend = "pallas" if (is_tpu and rows_per % 32 == 0) else "jnp"
    elif backend.startswith("pallas") and rows_per % 32 != 0:
        backend = "jnp"  # megakernel tiles are 32 rows tall
    from ..post import denoise as denoise_mod

    if (isinstance(denoise_state, denoise_mod.DenoiserStateCF)
            and not (backend in ("pallas", "pallas_hbm")
                     and (not cfg.enable_denoiser
                          or denoise_mod.sharded_cf_supported(rows_per,
                                                              cfg.width)))):
        # CF history but the CF shard path can't run here: unpack to the
        # field layout the lane shard path carries
        denoise_state = denoise_mod._state_cf_to_fields(denoise_state)
    return _render_pipeline_sharded(scene, cfg, mesh, backend, denoise_state,
                                    interpret, want_aux)
