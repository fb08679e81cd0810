"""Pallas denoiser kernels vs the jnp oracle (interpreter mode).

The tile-quantized reprojection is exact for tile-uniform motion (zero,
integer, fractional); for non-uniform sub-tile motion it drops history
where the jnp path warps per-pixel — covered by a rejection test.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from raytracevs_tpu.post import denoise as D
from raytracevs_tpu.ops.pallas import denoise_kernels as dk

H, W = 32, 256  # pallas path needs H%8==0, W%128==0, W>=256


def _state(seed=0, zero=False):
    rng = np.random.RandomState(seed)

    def mk(shape, scale=1.0):
        if zero:
            return jnp.zeros(shape, jnp.float32)
        return jnp.asarray(rng.rand(*shape).astype(np.float32) * scale)

    return D.DenoiserState(
        diffuse=mk((H, W, 4)), specular=mk((H, W, 4)),
        fast_diffuse=mk((H, W, 3)), fast_specular=mk((H, W, 3)),
        frames=mk((H, W), 10.0),
        view_z=mk((H, W), 50.0) + 1.0,
    )


def _pack(state):
    return jnp.concatenate(
        [state.diffuse.transpose(2, 0, 1), state.specular.transpose(2, 0, 1),
         state.fast_diffuse.transpose(2, 0, 1),
         state.fast_specular.transpose(2, 0, 1),
         state.frames[None], state.view_z[None]], axis=0)


def _run_both(motion, state=None, seed=1):
    rng = np.random.RandomState(seed)
    state = state or _state(seed + 1)
    curr_d = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    curr_s = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    view_z = state.view_z  # depth test passes everywhere

    ref = D.temporal_accumulate(curr_d, curr_s, motion, view_z, state)
    acc_d, acc_s, fast_d, fast_s, frames = ref

    curr = jnp.concatenate([curr_d.transpose(2, 0, 1), curr_s.transpose(2, 0, 1)], 0)
    new_packed = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), view_z, interpret=True)
    return (acc_d, acc_s, fast_d, fast_s, frames), new_packed


def _assert_match(ref, packed, atol=1e-5):
    acc_d, acc_s, fast_d, fast_s, frames = ref
    np.testing.assert_allclose(np.asarray(packed[0:4]),
                               np.asarray(acc_d.transpose(2, 0, 1)), atol=atol)
    np.testing.assert_allclose(np.asarray(packed[4:8]),
                               np.asarray(acc_s.transpose(2, 0, 1)), atol=atol)
    np.testing.assert_allclose(np.asarray(packed[8:11]),
                               np.asarray(fast_d.transpose(2, 0, 1)), atol=atol)
    np.testing.assert_allclose(np.asarray(packed[14]), np.asarray(frames), atol=atol)


def test_reproject_zero_motion_matches_oracle():
    motion = jnp.zeros((H, W, 2), jnp.float32)
    ref, packed = _run_both(motion)
    _assert_match(ref, packed)


def test_reproject_uniform_integer_motion_matches_oracle():
    motion = jnp.tile(jnp.asarray([3.0, -2.0], jnp.float32), (H, W, 1))
    ref, packed = _run_both(motion)
    _assert_match(ref, packed)


def test_reproject_uniform_fractional_motion_matches_oracle():
    motion = jnp.tile(jnp.asarray([1.25, -0.5], jnp.float32), (H, W, 1))
    ref, packed = _run_both(motion)
    _assert_match(ref, packed, atol=1e-4)


def test_reproject_nonuniform_motion_rejects_history():
    # strongly varying sub-tile motion: tile-quantization must DROP history
    # (frames restart at 0) rather than warp incorrectly
    rng = np.random.RandomState(3)
    motion = jnp.asarray((rng.rand(H, W, 2) * 8 - 4).astype(np.float32))
    state = _state(4)
    curr = jnp.concatenate([jnp.ones((4, H, W), jnp.float32),
                            jnp.ones((4, H, W), jnp.float32)], 0)
    packed = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), state.view_z, interpret=True)
    frames = np.asarray(packed[14])
    rejected = (frames == 0).mean()
    assert rejected > 0.5, f"only {rejected:.2f} rejected"
    # rejected pixels restart accumulation at the current frame
    restart = frames == 0
    acc_d = np.asarray(packed[0:3])
    assert np.allclose(acc_d[:, restart], 1.0, atol=1e-5)


def test_reproject_sky_and_depth_mismatch_reset():
    state = _state(5)
    rng = np.random.RandomState(6)
    curr_d = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    curr_s = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    # half the frame: big depth change; other half: sky
    view_z = np.asarray(state.view_z).copy()
    view_z[: H // 2] *= 10.0
    from raytracevs_tpu import constants as C

    view_z[H // 2:] = C.VIEWZ_SKY
    view_z = jnp.asarray(view_z)
    curr = jnp.concatenate([curr_d.transpose(2, 0, 1), curr_s.transpose(2, 0, 1)], 0)
    packed = dk.reproject_accumulate(
        _pack(state), curr, jnp.zeros((2, H, W), jnp.float32), view_z, interpret=True)
    assert (np.asarray(packed[14]) == 0).all()


def test_atrous_pallas_matches_oracle():
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(H, W, 6).astype(np.float32))
    view_z = jnp.asarray((rng.rand(H, W) * 50 + 1).astype(np.float32))
    nr = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    normal = D._decode_oct(nr)

    ref = D.atrous(img, view_z, normal)
    out = dk.atrous(img.transpose(2, 0, 1), view_z, normal.transpose(2, 0, 1),
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out.transpose(1, 2, 0)),
                               np.asarray(ref), atol=2e-5)


def test_shadow_denoise_pallas_matches_oracle():
    rng = np.random.RandomState(8)
    shadow = jnp.asarray(rng.rand(H, W, 2).astype(np.float32))
    obj_id = jnp.asarray(rng.randint(-1, 4, (H, W)).astype(np.int32))
    view_z = jnp.asarray((rng.rand(H, W) * 50 + 1).astype(np.float32))
    nr = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))

    ref = D.shadow_denoise(shadow, obj_id, view_z, nr)
    normal = D._decode_oct(nr)
    out = dk.shadow_denoise(shadow.transpose(2, 0, 1), obj_id, view_z,
                            normal.transpose(2, 0, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(out.transpose(1, 2, 0)),
                               np.asarray(ref), atol=2e-5)


def test_denoise_frame_pallas_path_matches_oracle_static():
    """Full denoise_frame: pallas path == jnp path for a static frame."""
    rng = np.random.RandomState(9)
    n = H * W

    class GB:
        diffuse_hitdist = jnp.asarray(rng.rand(n, 4).astype(np.float32))
        specular_hitdist = jnp.asarray(rng.rand(n, 4).astype(np.float32))
        motion = jnp.zeros((n, 2), jnp.float32)
        view_z = jnp.asarray((rng.rand(n) * 50 + 1).astype(np.float32))
        normal_roughness = jnp.asarray(rng.rand(n, 4).astype(np.float32))
        shadow_data = jnp.asarray(rng.rand(n, 2).astype(np.float32))
        obj_id = jnp.asarray(rng.randint(-1, 3, (n,)).astype(np.int32))

    state = _state(10)
    d1, s1, sh1, st1 = D.denoise_frame(GB, H, W, state, backend="jnp")
    d2, s2, sh2, st2 = D.denoise_frame(GB, H, W, state, backend="pallas",
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh2), np.asarray(sh1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.frames), np.asarray(st1.frames),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.diffuse), np.asarray(st1.diffuse),
                               atol=2e-5)


def test_atrous_wide_frame_uses_narrow_bands():
    """1440p/4K widths exceed the 16-row band window's VMEM budget; the
    sizing drops to 8-row bands instead of falling back to the jnp path.
    Equivalence must hold through the narrower window."""
    wh, ww = 16, 2560  # 1440p width; th=16 would allocate ~19.7 MB on-chip
    assert dk._stencil_sizes(wh, ww, 1) == (8, ww)
    assert dk._stencil_sizes(1088, 1920, 1) == (16, 1920)  # 1080p unchanged
    assert dk.stencil_supported(1440, 2560)
    assert dk.stencil_supported(2160, 3840)  # 4K fits at th=8

    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(wh, ww, 6).astype(np.float32))
    view_z = jnp.asarray((rng.rand(wh, ww) * 50 + 1).astype(np.float32))
    nr = jnp.asarray(rng.rand(wh, ww, 4).astype(np.float32))
    normal = D._decode_oct(nr)

    ref = D.atrous(img, view_z, normal)
    out = dk.atrous(img.transpose(2, 0, 1), view_z, normal.transpose(2, 0, 1),
                    interpret=True)
    np.testing.assert_allclose(np.asarray(out.transpose(1, 2, 0)),
                               np.asarray(ref), atol=2e-5)


def test_cf_state_matches_field_state():
    """Channel-first packed history (DenoiserStateCF — the layout the TPU
    path carries across frames) produces identical results to field-layout
    state through _denoise_frame_pallas, over two frames."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from raytracevs_tpu.ops.render import GBuffer
    from raytracevs_tpu.post import denoise as dn

    H, W = 16, 256
    n = H * W
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 9)
    gb = GBuffer(
        diffuse_hitdist=jax.random.uniform(ks[0], (n, 4), jnp.float32),
        specular_hitdist=jax.random.uniform(ks[1], (n, 4), jnp.float32),
        normal_roughness=jax.random.uniform(ks[2], (n, 4), jnp.float32),
        view_z=jax.random.uniform(ks[3], (n,), jnp.float32) * 10 + 1,
        motion=jax.random.uniform(ks[4], (n, 2), jnp.float32),
        albedo=jax.random.uniform(ks[5], (n, 4), jnp.float32),
        shadow_data=jax.random.uniform(ks[6], (n, 2), jnp.float32),
        shadow_translucency=jax.random.uniform(ks[7], (n, 3), jnp.float32),
        obj_id=(jax.random.uniform(ks[8], (n,)) * 4).astype(jnp.int32),
    )
    sf = dn.init_state(H, W)
    sc = dn.init_state_cf(H, W)
    for _ in range(2):
        df, spf, shf, sf = dn._denoise_frame_pallas(gb, H, W, sf,
                                                    interpret=True)
        dc, spc, shc, sc = dn._denoise_frame_pallas(gb, H, W, sc,
                                                    interpret=True)
        assert isinstance(sc, dn.DenoiserStateCF)
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(df))
        np.testing.assert_array_equal(np.asarray(spc), np.asarray(spf))
        np.testing.assert_array_equal(np.asarray(shc), np.asarray(shf))
        repacked = dn._state_cf_to_fields(sc)
        for a, b in zip(repacked, sf):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
def test_half_precision_state_tracks_f32(dtype):
    """History stored at half precision (RTVS_STATE_DTYPE; NRD's pools are
    fp16) stays within storage-quantization tolerance of the f32 state
    through a 4-frame accumulation, and the dtype survives the carry."""
    state32 = _state(21)
    p32 = _pack(state32)
    ph = p32.astype(dtype)
    rng = np.random.RandomState(22)
    motion = jnp.tile(jnp.asarray([1.25, -0.5], jnp.float32), (H, W, 1))
    for i in range(4):
        curr = jnp.asarray(rng.rand(8, H, W).astype(np.float32))
        p32 = dk.reproject_accumulate(p32, curr, motion.transpose(2, 0, 1),
                                      state32.view_z, interpret=True)
        ph = dk.reproject_accumulate(ph, curr, motion.transpose(2, 0, 1),
                                     state32.view_z, interpret=True)
        assert ph.dtype == dtype
    f32_frames = np.asarray(p32[14])
    h_frames = np.asarray(ph[14].astype(jnp.float32))
    # the quantized hist_z can flip the 10%-threshold depth test at pixels
    # that straddle the boundary — tolerate a small fraction of validity
    # flips, and exclude them from the value comparison
    same = f32_frames == h_frames
    assert same.mean() > 0.99, f"frames differ at {(~same).mean():.3f}"
    a = np.asarray(p32[0:14])[:, same]
    b = np.asarray(ph[0:14].astype(jnp.float32))[:, same]
    # values are O(1); tolerance = a few ulps of the storage format
    tol = 4e-3 if dtype == jnp.float16 else 3e-2
    assert np.abs(a - b).max() < tol


def test_atrous_half_storage_close_to_f32():
    """storage_dtype streams the stencil window at half precision; the
    result stays within input-quantization error of the f32 filter."""
    rng = np.random.RandomState(23)
    img = jnp.asarray(rng.rand(6, H, W).astype(np.float32))
    view_z = jnp.asarray((rng.rand(H, W) * 50 + 1).astype(np.float32))
    nr = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    normal = D._decode_oct(nr).transpose(2, 0, 1)
    ref = dk.atrous(img, view_z, normal, interpret=True)
    half = dk.atrous(img, view_z, normal, interpret=True,
                     storage_dtype=jnp.float16)
    assert np.abs(np.asarray(ref) - np.asarray(half)).max() < 5e-3


# ---- REBLUR fidelity features (round 5): hitdist reconstruction,
# ---- responsive accumulation, specular pre-pass blur ----------------------
def test_responsive_accumulation_matches_oracle():
    """roughness plane with mirror / rough halves: kernel and oracle agree,
    and mirror pixels (roughness < 0.05) cap specular history at the FAST
    frame count (NRDDenoiser.cpp:864-865)."""
    rng = np.random.RandomState(21)
    state = _state(22)
    state = state._replace(frames=jnp.full((H, W), 10.0, jnp.float32))
    curr_d = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    curr_s = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    rough = np.full((H, W), 0.5, np.float32)
    rough[:, : W // 2] = 0.0  # perfect mirror half
    rough = jnp.asarray(rough)
    motion = jnp.zeros((H, W, 2), jnp.float32)

    ref = D.temporal_accumulate(curr_d, curr_s, motion, state.view_z, state,
                                roughness=rough)
    acc_d, acc_s, _, _, frames = ref
    curr = jnp.concatenate(
        [curr_d.transpose(2, 0, 1), curr_s.transpose(2, 0, 1)], 0)
    packed = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), state.view_z,
        interpret=True, roughness=rough)
    np.testing.assert_allclose(np.asarray(packed[4:8]),
                               np.asarray(acc_s.transpose(2, 0, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(packed[0:4]),
                               np.asarray(acc_d.transpose(2, 0, 1)),
                               atol=1e-5)
    # mirror half: spec alpha = 1/(1+min(frames,4)) = 1/5; rough half:
    # 1/(1+11) (frames counter itself stays roughness-independent).
    # Recovered from the HITDIST channel (3) — the rgb channels pass
    # through the anti-lag clamp, which would corrupt the estimate.
    a = np.asarray(acc_s)[..., 3]
    hs = np.asarray(state.specular)[..., 3]
    cs = np.asarray(curr_s)[..., 3]
    denom = cs - hs
    ok = np.abs(denom) > 0.1
    alpha = np.where(ok, (a - hs) / np.where(ok, denom, 1.0), np.nan)
    am = alpha[:, : W // 2][ok[:, : W // 2]]
    ar = alpha[:, W // 2:][ok[:, W // 2:]]
    assert am.size > 100 and ar.size > 100
    np.testing.assert_allclose(am, 1.0 / 5.0, atol=1e-4)
    np.testing.assert_allclose(ar, 1.0 / 12.0, atol=1e-4)


def test_hitdist_reconstruction_area3x3():
    """AREA_3X3 (NRDDenoiser.cpp:858): a zero-hitdist surface pixel takes
    the mean of its valid 3x3 neighbors; pixels with data are untouched;
    sky pixels stay zero."""
    from raytracevs_tpu import constants as C

    h, w = 16, 16
    curr = np.zeros((8, h, w), np.float32)
    curr[3] = 5.0  # diffuse hitdist everywhere...
    curr[3, 4, 4] = 0.0  # ...except one hole
    curr[7] = 2.0
    curr[7, 8, 8] = 0.0
    view_z = np.full((h, w), 10.0, np.float32)
    view_z[0, :] = C.VIEWZ_SKY  # sky row
    curr[3, 0, :] = 0.0
    curr[7, 0, :] = 0.0
    out = np.asarray(D.reblur_prepass(
        jnp.asarray(curr), jnp.asarray(view_z),
        jnp.zeros((h, w), jnp.float32)))
    assert out[3, 4, 4] == pytest.approx(5.0, abs=1e-5)
    assert out[7, 8, 8] == pytest.approx(2.0, abs=1e-5)
    assert out[3, 10, 10] == pytest.approx(5.0, abs=1e-6)  # untouched
    assert (out[3, 0, :] == 0.0).all()  # sky stays empty
    # row 1 neighbors the sky row: its reconstruction-free pixels keep 5.0
    assert out[3, 1, 5] == pytest.approx(5.0, abs=1e-6)


def test_spec_prepass_mirror_identity_rough_blur():
    """specularPrepassBlurRadius (NRDDenoiser.cpp:867-868): roughness 0
    leaves specular bit-unchanged (minBlurRadius=0 mirror sharpness);
    rough pixels get a hot pixel knocked down and spread."""
    h, w = 32, 32
    rng = np.random.RandomState(31)
    curr = rng.rand(8, h, w).astype(np.float32) * 0.1
    curr[3] = 1.0
    curr[7] = 5.0  # plenty of hitdist -> full radius
    curr[4:7, 16, 16] = 10.0  # hot specular pixel
    view_z = np.full((h, w), 10.0, np.float32)

    out_mirror = np.asarray(D.reblur_prepass(
        jnp.asarray(curr), jnp.asarray(view_z), jnp.zeros((h, w), jnp.float32)))
    np.testing.assert_allclose(out_mirror[4:7], curr[4:7], atol=1e-5)

    out_rough = np.asarray(D.reblur_prepass(
        jnp.asarray(curr), jnp.asarray(view_z), jnp.ones((h, w), jnp.float32)))
    assert out_rough[4, 16, 16] < 5.0  # peak knocked down
    assert out_rough[4, 16, 19] > curr[4, 16, 19]  # energy spread outward


def test_spec_virtual_motion_matches_oracle_and_static_noop():
    """Specular virtual-motion reprojection: (a) with motion_spec ==
    motion the output is bit-identical to the legacy single-field path;
    (b) with a uniform virtual offset differing from surface motion, the
    spec channels come from the virtual location (kernel == oracle)."""
    state = _state(41)
    rng = np.random.RandomState(42)
    curr_d = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    curr_s = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))
    curr = jnp.concatenate(
        [curr_d.transpose(2, 0, 1), curr_s.transpose(2, 0, 1)], 0)
    motion = jnp.tile(jnp.asarray([2.0, 1.0], jnp.float32), (H, W, 1))

    # (a) static equivalence: virtual field identical to surface field
    legacy = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), state.view_z,
        interpret=True)
    virt_same = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), state.view_z,
        interpret=True, motion_spec=motion.transpose(2, 0, 1))
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(virt_same))

    # (b) distinct uniform virtual offset: kernel vs oracle
    mspec = jnp.tile(jnp.asarray([-3.0, 4.0], jnp.float32), (H, W, 1))
    ref = D.temporal_accumulate(curr_d, curr_s, motion, state.view_z, state,
                                motion_spec=mspec)
    acc_d, acc_s, _, _, frames = ref
    packed = dk.reproject_accumulate(
        _pack(state), curr, motion.transpose(2, 0, 1), state.view_z,
        interpret=True, motion_spec=mspec.transpose(2, 0, 1))
    np.testing.assert_allclose(np.asarray(packed[0:4]),
                               np.asarray(acc_d.transpose(2, 0, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(packed[4:8]),
                               np.asarray(acc_s.transpose(2, 0, 1)),
                               atol=1e-5)
    # and the virtual fetch actually moved the spec history: against the
    # single-field result the spec channels must differ somewhere
    assert np.abs(np.asarray(packed[4:8])
                  - np.asarray(legacy[4:8])).max() > 1e-4
