"""Stateless RNG and sampling.

Bit-exact port of the reference's PCG-hash RNG with per-decision salt
channels (src/Shader/Common.hlsli:611-618, 761-797, 832-874, 1086-1091) so
noise patterns are comparable frame-for-frame, plus a deterministic 16x16
blue-noise tile standing in for Resource/Texture/BlueNoise16.png
(RayGen.hlsl:9-15) — generated with void-and-cluster at import time rather
than shipped as an asset.
"""
from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

_U32 = jnp.uint32


def u32(x):
    return jnp.asarray(x).astype(_U32)


def pcg_hash(v):
    """PCG-inspired hash (Common.hlsli:773-778). v: uint32 array."""
    v = v.astype(_U32) * _U32(747796405) + _U32(2891336453)
    word = ((v >> ((v >> _U32(28)) + _U32(4))) ^ v) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def wang_hash(seed):
    """WangHash (Common.hlsli:762-770)."""
    seed = seed.astype(_U32)
    seed = (seed ^ _U32(61)) ^ (seed >> _U32(16))
    seed = seed * _U32(9)
    seed = seed ^ (seed >> _U32(4))
    seed = seed * _U32(0x27D4EB2D)
    seed = seed ^ (seed >> _U32(15))
    return seed


def rng_init(pixel_x, pixel_y, frame, sample, salt):
    """rng_init (Common.hlsli:785-791): returns the uint32 state."""
    s = (
        u32(pixel_x) * _U32(1973)
        + u32(pixel_y) * _U32(9277)
        + u32(frame) * _U32(26699)
        + u32(sample) * _U32(31837)
        + u32(salt) * _U32(911)
    )
    return pcg_hash(s)


def rng_next(state):
    """rng_next (Common.hlsli:793-797): (new_state, float in [0,1))."""
    state = pcg_hash(state)
    value = (state >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)
    return state, value


# RandomFloat (Common.hlsli:833-837) has identical semantics to rng_next.
random_float = rng_next


def random_on_disk(state):
    """RandomOnDisk (Common.hlsli:1086-1091): concentric-free sqrt disk sample."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    r = jnp.sqrt(u1)
    theta = u2 * jnp.float32(6.28318530718)
    return state, jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def random_on_sphere(state):
    """RandomOnSphere (Common.hlsli:840-846)."""
    state, z0 = random_float(state)
    state, p0 = random_float(state)
    z = z0 * 2.0 - 1.0
    phi = p0 * jnp.float32(6.28318530718)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return state, jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def build_orthonormal_basis(direction):
    """BuildOrthonormalBasis (Common.hlsli:1094-1099). direction: [...,3]."""
    d = direction
    up = jnp.where(
        jnp.abs(d[..., 1:2]) < 0.999,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], d.dtype), d.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], d.dtype), d.shape),
    )
    tangent = jnp.cross(up, d)
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12
    )
    bitangent = jnp.cross(d, tangent)
    return tangent, bitangent


def cosine_sample_hemisphere(normal, state):
    """CosineSampleHemisphere (Common.hlsli:856-874)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    r = jnp.sqrt(u1)
    theta = jnp.float32(6.28318530718) * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    up = jnp.where(
        jnp.abs(normal[..., 1:2]) < 0.999,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], normal.dtype), normal.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], normal.dtype), normal.shape),
    )
    tangent = jnp.cross(up, normal)
    tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    bitangent = jnp.cross(normal, tangent)
    d = tangent * x[..., None] + bitangent * y[..., None] + normal * z[..., None]
    return state, d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def perturb_reflection(reflect_dir, normal, roughness, state):
    """PerturbReflection (Common.hlsli:804-830): GGX-ish roughness perturbation.

    Consumes exactly two randoms like the reference (only when roughness >=
    0.01 there; we always consume and select — the reference only calls this
    with a dedicated freshly-salted RNG, so stream position does not leak).
    """
    state, r1 = random_float(state)
    state, r2 = random_float(state)
    n = normal
    t0 = jnp.where(
        jnp.abs(n[..., 0:1]) > 0.9,
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
    )
    tangent = jnp.cross(n, t0)
    tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    bitangent = jnp.cross(n, tangent)
    angle = r1 * jnp.float32(6.28318)
    radius = roughness * roughness * r2
    offset = (jnp.cos(angle)[..., None] * tangent + jnp.sin(angle)[..., None] * bitangent) * radius[
        ..., None
    ]
    perturbed = reflect_dir + offset
    perturbed = perturbed / jnp.maximum(jnp.linalg.norm(perturbed, axis=-1, keepdims=True), 1e-12)
    below = jnp.sum(perturbed * n, axis=-1, keepdims=True) < 0.0
    reflected = perturbed - 2.0 * jnp.sum(perturbed * n, axis=-1, keepdims=True) * n
    perturbed = jnp.where(below, reflected, perturbed)
    smooth = (roughness < 0.01)[..., None]
    return state, jnp.where(smooth, reflect_dir, perturbed)


def sample_spherical_light(light_center, light_radius, hit_pos, state):
    """SampleSphericalLight (Common.hlsli:1102-1116)."""
    state, disk = random_on_disk(state)
    to_light = light_center - hit_pos
    to_light = to_light / jnp.maximum(jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-12)
    tangent, bitangent = build_orthonormal_basis(to_light)
    offset = (tangent * disk[..., 0:1] + bitangent * disk[..., 1:2]) * light_radius[..., None]
    return state, light_center + offset


# ---------------------------------------------------------------------------
# Blue noise (stand-in for Resource/Texture/BlueNoise16.png)
# ---------------------------------------------------------------------------
def _void_and_cluster(size: int, seed: int) -> np.ndarray:
    """Generate a [size,size] blue-noise rank texture in [0,1) (void-and-cluster)."""
    rng = np.random.RandomState(seed)
    n = size * size
    # initial random binary pattern with ~10% ones
    pattern = np.zeros(n, bool)
    ones = rng.choice(n, n // 10, replace=False)
    pattern[ones] = True

    yy, xx = np.mgrid[0:size, 0:size]

    def energy(p):
        e = np.zeros((size, size))
        idx = np.flatnonzero(p)
        for i in idx:
            dy = np.abs(yy - i // size)
            dx = np.abs(xx - i % size)
            dy = np.minimum(dy, size - dy)
            dx = np.minimum(dx, size - dx)
            e += np.exp(-(dx * dx + dy * dy) / (2.0 * 1.9 * 1.9))
        return e

    # Tighten the initial pattern: swap tightest cluster into largest void.
    for _ in range(4 * n // 10):
        e = energy(pattern)
        cluster = np.argmax(np.where(pattern.reshape(size, size), e, -np.inf))
        void = np.argmin(np.where(pattern.reshape(size, size), np.inf, e))
        if cluster == void:
            break
        pattern[cluster] = False
        pattern[void] = True

    rank = np.zeros(n, np.int32)
    # Phase 1: remove ones tightest-first
    p = pattern.copy()
    order = np.count_nonzero(p)
    for r in range(order - 1, -1, -1):
        e = energy(p)
        cluster = np.argmax(np.where(p.reshape(size, size), e, -np.inf))
        p[cluster] = False
        rank[cluster] = r
    # Phase 2: add ones into largest voids
    p = pattern.copy()
    for r in range(order, n):
        e = energy(p)
        void = np.argmin(np.where(p.reshape(size, size), np.inf, e))
        p[void] = True
        rank[void] = r
    return (rank.reshape(size, size).astype(np.float64) + 0.5) / n


_BLUE_NOISE_CACHE = None

# The reference's actual asset (Resource/Texture/BlueNoise16.png), vendored
# so per-pixel sample positions match it bit-for-bit. Loaded as
# R8G8B8A8_UNORM (DXRPipeline.cpp:1613) -> float = v/255.
_BLUE_NOISE_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "BlueNoise16.png",
)


def blue_noise_tile() -> jnp.ndarray:
    """16x16x4 blue-noise tile: the reference's BlueNoise16.png asset.

    Falls back to a void-and-cluster generated tile if the asset is
    missing. The cache holds host numpy (never a traced value) so calling
    this inside jit/shard_map traces embeds it as a constant instead of
    leaking a tracer.
    """
    global _BLUE_NOISE_CACHE
    if _BLUE_NOISE_CACHE is None:
        try:
            from ..io.png import read_png

            rgba = read_png(_BLUE_NOISE_ASSET)
            assert rgba.shape == (16, 16, 4), rgba.shape
            _BLUE_NOISE_CACHE = rgba.astype(np.float32) / np.float32(255.0)
        except (OSError, ValueError, AssertionError):
            chans = [_void_and_cluster(16, seed) for seed in (12345, 54321, 98765, 13579)]
            _BLUE_NOISE_CACHE = np.stack(chans, axis=-1).astype(np.float32)
    return jnp.asarray(_BLUE_NOISE_CACHE)


def sample_blue_noise(tile, pixel_x, pixel_y, frame, sample_index):
    """SampleBlueNoise (RayGen.hlsl:9-15): scrolling 16x16 tile lookup."""
    ox = u32(frame) * _U32(3) + u32(sample_index) * _U32(11)
    oy = u32(frame) * _U32(5) + u32(sample_index) * _U32(7)
    px = (u32(pixel_x) + ox) & _U32(15)
    py = (u32(pixel_y) + oy) & _U32(15)
    return tile[py.astype(jnp.int32), px.astype(jnp.int32)]
