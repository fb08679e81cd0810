"""Shading math tests (Common.hlsli BRDF/sky/checker semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.ops import shade
from raytracevs_tpu.post import tonemap


def test_luminance():
    assert float(shade.luminance(jnp.array([1.0, 1.0, 1.0]))) == pytest.approx(1.0)
    assert float(shade.luminance(jnp.array([0.0, 1.0, 0.0]))) == pytest.approx(0.7152)


def test_attenuation_artistic_default():
    # c=1, l=0, q=0.01 at d=10 -> 1/(1+0+1) = 0.5
    a = shade.compute_attenuation(jnp.asarray(10.0), 1.0, 0.0, 0.01)
    assert float(a) == pytest.approx(0.5)


def test_fresnel_schlick_limits():
    assert float(shade.fresnel_schlick(jnp.asarray(1.0), 0.04)) == pytest.approx(0.04)
    assert float(shade.fresnel_schlick(jnp.asarray(0.0), 0.04)) == pytest.approx(1.0)


def test_ggx_peak_at_normal_incidence():
    r = jnp.asarray(0.5)
    assert float(shade.ggx_d(jnp.asarray(1.0), r)) > float(shade.ggx_d(jnp.asarray(0.5), r))


def test_cook_torrance_energy_positive():
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    v = jnp.asarray([[0.0, 1.0, 0.0]])
    l = jnp.asarray([[0.0, 1.0, 0.0]])
    f0 = jnp.full((1, 3), 0.04)
    spec = shade.cook_torrance_specular(n, v, l, f0, jnp.asarray([0.5]))
    assert np.all(np.asarray(spec) >= 0.0)


def test_sky_gradient_zenith_bluer_than_horizon():
    zen = np.asarray(shade.sky_color(jnp.asarray([[0.0, 1.0, 0.0]])))[0]
    hor = np.asarray(shade.sky_color(jnp.asarray([[1.0, 0.0, 0.0]])))[0]
    ground = np.asarray(shade.sky_color(jnp.asarray([[0.0, -1.0, 0.0]])))[0]
    np.testing.assert_allclose(zen, [0.15, 0.35, 0.75], atol=1e-3)
    assert hor.mean() > zen.mean()  # horizon is brighter
    assert ground.mean() < hor.mean()  # below horizon dimmed


def test_checker_alternates():
    cam = jnp.asarray([0.0, 1.0, 0.0])
    fwd = jnp.asarray([0.0, -1.0, 0.0])
    p1 = jnp.asarray([[0.5, 0.0, 0.5]])
    p2 = jnp.asarray([[1.5, 0.0, 0.5]])
    base = jnp.zeros((1, 3))
    c1 = np.asarray(shade.checker_albedo(base, p1, cam[None], fwd[None]))[0]
    c2 = np.asarray(shade.checker_albedo(base, p2, cam[None], fwd[None]))[0]
    assert abs(c1.mean() - c2.mean()) > 0.3  # dark vs bright cell near camera


def test_checker_fades_with_distance():
    cam = jnp.asarray([0.0, 1.0, 0.0])
    fwd = jnp.asarray([0.0, 0.0, 1.0])
    base = jnp.zeros((1, 3))
    def cell(x, z):
        return np.asarray(
            shade.checker_albedo(base, jnp.asarray([[x, 0.0, z]]), cam[None], fwd[None])
        )[0].mean()

    near_contrast = abs(cell(0.5, 0.5) - cell(1.5, 0.5))
    far_contrast = abs(cell(0.5, 500.5) - cell(1.5, 500.5))
    # Exponential fade: contrast collapses to 0.3x at distance (ClosestHit.hlsl:86-94)
    assert far_contrast < near_contrast * 0.5
    assert far_contrast == pytest.approx(near_contrast * 0.3, rel=0.05)


def test_sigma_penumbra_packing():
    # Fully lit -> FP16_MAX
    v = shade.sigma_pack_penumbra_directional(jnp.asarray(65504.0), jnp.asarray(0.1))
    assert float(v) == pytest.approx(65504.0)
    v = shade.sigma_pack_penumbra_local(
        jnp.asarray(2.0), jnp.asarray(10.0), jnp.asarray(0.2)
    )
    assert float(v) == pytest.approx(0.2 * 2.0 / 8.0 * 0.5, rel=1e-5)


def test_tonemap_operators():
    c = jnp.asarray([[1.0, 2.0, 4.0]])
    rh = np.asarray(tonemap.reinhard(c))[0]
    np.testing.assert_allclose(rh, [0.5, 2 / 3, 0.8], rtol=1e-6)
    aces = np.asarray(tonemap.aces_film(c))[0]
    assert np.all(aces <= 1.0) and np.all(aces >= 0.0)
    assert aces[2] > aces[0]


def test_srgb_roundtrip_monotonic():
    x = jnp.linspace(0.0, 1.0, 64)
    y = np.asarray(tonemap.linear_to_srgb(x))
    assert np.all(np.diff(y) > 0)
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    assert y[-1] == pytest.approx(1.0, abs=1e-5)


def test_tonemap_and_gamma_selects_operator():
    c = jnp.asarray([[0.5, 0.5, 0.5]])
    none = np.asarray(tonemap.tonemap_and_gamma(c, 1.0, jnp.asarray(2), jnp.asarray(1.0)))[0]
    np.testing.assert_allclose(none, [0.5, 0.5, 0.5], atol=1e-6)
    rh = np.asarray(tonemap.tonemap_and_gamma(c, 1.0, jnp.asarray(0), jnp.asarray(1.0)))[0]
    np.testing.assert_allclose(rh, [1 / 3] * 3, rtol=1e-5)
    srgb = np.asarray(tonemap.tonemap_and_gamma(c, 1.0, jnp.asarray(2), jnp.asarray(2.2)))[0]
    np.testing.assert_allclose(srgb, np.asarray(tonemap.linear_to_srgb(jnp.asarray(0.5))),
                               atol=1e-6)
