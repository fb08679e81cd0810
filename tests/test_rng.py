"""RNG bit-exactness vs a straight numpy transcription of Common.hlsli:761-797."""
import numpy as np

import jax.numpy as jnp

from raytracevs_tpu.ops import sampling


def np_pcg_hash(v: np.uint32) -> np.uint32:
    with np.errstate(over="ignore"):
        v = np.uint32((np.uint64(v) * 747796405 + 2891336453) & 0xFFFFFFFF)
        shift = np.uint32((v >> np.uint32(28)) + np.uint32(4))
        word = np.uint32((np.uint64(v >> shift) ^ np.uint64(v)) * 277803737 & 0xFFFFFFFF)
        return np.uint32(word >> np.uint32(22)) ^ word


def np_wang_hash(seed: np.uint32) -> np.uint32:
    with np.errstate(over="ignore"):
        seed = np.uint32(seed)
        seed = (seed ^ np.uint32(61)) ^ (seed >> np.uint32(16))
        seed = np.uint32((np.uint64(seed) * 9) & 0xFFFFFFFF)
        seed = seed ^ (seed >> np.uint32(4))
        seed = np.uint32((np.uint64(seed) * 0x27D4EB2D) & 0xFFFFFFFF)
        return seed ^ (seed >> np.uint32(15))


def test_pcg_hash_matches_reference_formula():
    for v in [0, 1, 42, 123456789, 0xFFFFFFFF, 0xDEADBEEF]:
        got = int(sampling.pcg_hash(jnp.asarray(np.uint32(v))))
        assert got == int(np_pcg_hash(np.uint32(v))), hex(v)


def test_wang_hash_matches_reference_formula():
    for v in [0, 1, 42, 0xFFFFFFFF]:
        got = int(sampling.wang_hash(jnp.asarray(np.uint32(v))))
        assert got == int(np_wang_hash(np.uint32(v)))


def test_rng_init_formula():
    px, py, frame, sample, salt = 13, 27, 3, 5, 6
    with np.errstate(over="ignore"):
        s = np.uint32(
            (px * 1973 + py * 9277 + frame * 26699 + sample * 31837 + salt * 911) & 0xFFFFFFFF
        )
    expected = int(np_pcg_hash(s))
    got = int(sampling.rng_init(px, py, frame, sample, salt))
    assert got == expected


def test_rng_next_range_and_determinism():
    state = sampling.rng_init(
        jnp.arange(100, dtype=jnp.uint32), jnp.zeros(100, jnp.uint32), 0, 0, 1
    )
    vals = []
    for _ in range(8):
        state, v = sampling.rng_next(state)
        vals.append(np.asarray(v))
    vals = np.stack(vals)
    assert vals.min() >= 0.0 and vals.max() < 1.0
    # Determinism across calls
    state2 = sampling.rng_init(
        jnp.arange(100, dtype=jnp.uint32), jnp.zeros(100, jnp.uint32), 0, 0, 1
    )
    _, v2 = sampling.rng_next(state2)
    np.testing.assert_array_equal(vals[0], np.asarray(v2))
    # Reasonable uniformity
    assert abs(vals.mean() - 0.5) < 0.05


def test_salt_channels_decorrelate():
    s1 = sampling.rng_init(5, 7, 0, 0, 1)
    s2 = sampling.rng_init(5, 7, 0, 0, 2)
    assert int(s1) != int(s2)


def test_disk_sample_in_unit_disk():
    state = sampling.rng_init(jnp.arange(64, dtype=jnp.uint32), 0, 0, 0, 6)
    _, d = sampling.random_on_disk(state)
    r = np.linalg.norm(np.asarray(d), axis=-1)
    assert r.max() <= 1.0 + 1e-6


def test_sphere_sample_unit_length():
    state = sampling.rng_init(jnp.arange(64, dtype=jnp.uint32), 0, 0, 0, 5)
    _, d = sampling.random_on_sphere(state)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_cosine_hemisphere_above_surface():
    n = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (64, 1))
    state = sampling.rng_init(jnp.arange(64, dtype=jnp.uint32), 0, 0, 0, 4)
    _, d = sampling.cosine_sample_hemisphere(n, state)
    assert np.asarray(d)[:, 1].min() >= 0.0


def test_blue_noise_tile_properties():
    tile = np.asarray(sampling.blue_noise_tile())
    assert tile.shape == (16, 16, 4)
    assert tile.min() >= 0.0 and tile.max() <= 1.0
    # Each channel is a permutation of 256 distinct ranks -> near-uniform
    # histogram. The real asset stores rank/255 (u8 UNORM); the generated
    # fallback stores (rank+0.5)/256 — accept either quantization.
    for c in range(4):
        vals = np.sort(tile[..., c].ravel())
        assert len(np.unique(vals)) == 256
        np.testing.assert_allclose(vals, np.arange(256) / 255.0, atol=1.0 / 255.0)


def test_perturb_reflection_smooth_passthrough():
    n = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (8, 1))
    refl = jnp.tile(jnp.array([0.0, 0.7071, 0.7071]), (8, 1))
    state = sampling.rng_init(jnp.arange(8, dtype=jnp.uint32), 0, 0, 0, 7)
    _, out = sampling.perturb_reflection(refl, n, jnp.zeros(8), state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(refl), atol=1e-6)


def test_perturb_reflection_stays_in_hemisphere():
    n = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (256, 1))
    refl = jnp.tile(jnp.array([0.0, 0.1, 0.995]), (256, 1))
    refl = refl / jnp.linalg.norm(refl, axis=-1, keepdims=True)
    state = sampling.rng_init(jnp.arange(256, dtype=jnp.uint32), 0, 0, 0, 7)
    _, out = sampling.perturb_reflection(refl, n, jnp.full(256, 0.9), state)
    assert np.asarray(jnp.sum(out * n, axis=-1)).min() >= 0.0
