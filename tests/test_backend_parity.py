"""Cross-backend golden parity: jnp wavefront vs Pallas megakernel at real
resolution over every BASELINE config (SURVEY §4 "Implication for the TPU
build"). The megakernel runs in Pallas interpreter mode on CPU, which
executes the exact kernel program — this proves the TPU compute path
implements the same shading semantics as the portable oracle on all the
configs the perf baseline is quoted on, not just hand-picked scenes.

Interpreter mode at 256x256 is slow (minutes per config), so the sweep is
gated behind RTVS_NIGHTLY=1; CI/regular runs execute a single smaller
config as a smoke check. Run the full sweep with:

    RTVS_NIGHTLY=1 python -m pytest tests/test_backend_parity.py -q
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from test_golden import CONFIGS, _engine_for

SSIM_THRESHOLD = 0.99
# The glass-mesh config is chaotic: triangle t-values agree only to ~1 ULP
# between the two formulations (XLA orders FMAs differently), and grazing
# refraction paths through the wine glass amplify single-bit flips into
# whole-path divergence (see tests/test_megakernel.py, which bounds the
# divergent-pixel fraction instead). 0.98 matches the BASELINE SSIM bar.
PER_CONFIG_THRESHOLD = {"config4_mesh": 0.98}
RES = 256


def _parity_for(config_name, res):
    from raytracevs_tpu import Engine
    from raytracevs_tpu.ops.render import render_rows
    from raytracevs_tpu.post import composite as composite_mod
    from raytracevs_tpu.post import tonemap
    from raytracevs_tpu.utils.ssim import ssim

    if config_name == "config0_sample_scene":
        from conftest import analytic_scene_file

        engine = Engine(res, res)
        engine.load_rtvs(analytic_scene_file(),
                         samples_per_pixel=2, max_bounces=6)
    else:
        engine = _engine_for(config_name, res=res)
    flat, cfg = engine._flat, engine._cfg

    def frame(backend, interpret=False):
        out = render_rows(flat, cfg, jnp.int32(0), cfg.height,
                          backend=backend, interpret=interpret)
        color01 = composite_mod.composite(
            out.gbuffer, out.raw_specular, flat.exposure,
            flat.tone_map_operator, flat.gamma, use_denoised=False,
        )
        rgba = np.asarray(tonemap.to_rgba8(color01)).reshape(res, res, 4)
        return rgba, float(np.asarray(out.rays))

    ref, rays_ref = frame("jnp")
    pal, rays_pal = frame("pallas", interpret=True)
    score = ssim(pal, ref)
    threshold = PER_CONFIG_THRESHOLD.get(config_name, SSIM_THRESHOLD)
    assert score >= threshold, (
        f"{config_name}: pallas vs jnp SSIM {score:.5f} < {threshold} "
        f"(rays {rays_pal:.0f} vs {rays_ref:.0f})"
    )
    # control flow through the wavefront must agree closely too
    assert abs(rays_pal - rays_ref) / max(rays_ref, 1.0) < 5e-3


@pytest.mark.parametrize("config_name", CONFIGS)
def test_backend_parity_nightly(config_name):
    if not os.environ.get("RTVS_NIGHTLY"):
        pytest.skip("full 256x256 sweep is nightly; set RTVS_NIGHTLY=1")
    _parity_for(config_name, RES)


def test_backend_parity_smoke():
    """Always-on smaller-scale parity check on the canonical scene."""
    _parity_for("config0_sample_scene", 128)
