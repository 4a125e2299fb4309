"""Affine warp and TTA tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

from diffuncertainty_tpu.ops.warp import (
    compose_affine,
    hflip_matrix,
    invert_affine,
    rotation_matrix,
    warp_affine,
)
from diffuncertainty_tpu.sampling import (
    TTAConfig,
    apply_tta,
    invert_tta,
    sample_tta_params,
)


def test_invert_affine_round_trip(rng):
    m = jnp.asarray(rng.standard_normal((5, 2, 3)).astype(np.float32))
    m = m.at[:, 0, 0].add(2.0)  # keep well-conditioned
    m = m.at[:, 1, 1].add(2.0)
    ident = compose_affine(m, invert_affine(m))
    expect = np.broadcast_to(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (5, 2, 3))
    np.testing.assert_allclose(np.asarray(ident), expect, atol=1e-5)


def test_hflip_warp_is_exact(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    m = jnp.broadcast_to(hflip_matrix(8), (2, 2, 3))
    out = np.asarray(warp_affine(jnp.asarray(x), m))
    np.testing.assert_allclose(out, x[:, :, ::-1, :], atol=1e-6)


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_rotation_matches_scipy(rng, mode):
    """warp_affine vs scipy.ndimage.affine_transform (order=1 bilinear)."""
    h = w = 16
    x = rng.standard_normal((1, h, w, 1)).astype(np.float32)
    angle, scale = 17.0, 1.1
    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    m_fwd = rotation_matrix(jnp.asarray([angle]), jnp.asarray([scale]), center)
    dst_to_src = invert_affine(m_fwd)
    got = np.asarray(
        warp_affine(
            jnp.asarray(x), dst_to_src,
            border_mode=("replicate" if mode == "replicate" else "constant"),
            border_value=0.0,
        )
    )[0, :, :, 0]

    # scipy affine_transform: out[o] = in[matrix @ o + offset], coords (row, col)
    m = np.asarray(dst_to_src)[0]  # x' = a x + b y + c (xy order)
    mat_rc = np.array([[m[1, 1], m[1, 0]], [m[0, 1], m[0, 0]]])
    off_rc = np.array([m[1, 2], m[0, 2]])
    ref = ndi.affine_transform(
        x[0, :, :, 0], mat_rc, offset=off_rc, order=1,
        mode=("nearest" if mode == "replicate" else "grid-constant"), cval=0.0,
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_large_translation_far_outside_border(rng, mode):
    """Sample points >1px outside the image: replicate clamps to the edge
    pixel, constant fills border_value (pins the patch-gather mask path)."""
    h = w = 12
    x = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    # dst->src translation by (+7.3, -9.6): many dst pixels map far outside
    m = jnp.asarray([[[1.0, 0.0, 7.3], [0.0, 1.0, -9.6]]])
    got = np.asarray(warp_affine(jnp.asarray(x), m, border_mode=mode, border_value=0.0))

    mm = np.asarray(m)[0]
    mat_rc = np.array([[mm[1, 1], mm[1, 0]], [mm[0, 1], mm[0, 0]]])
    off_rc = np.array([mm[1, 2], mm[0, 2]])
    for c in range(2):
        ref = ndi.affine_transform(
            x[0, :, :, c], mat_rc, offset=off_rc, order=1,
            mode=("nearest" if mode == "replicate" else "grid-constant"), cval=0.0,
        )
        np.testing.assert_allclose(got[0, :, :, c], ref, atol=1e-5)


def test_nearest_interpolation_labels(rng):
    labels = rng.integers(0, 5, (1, 12, 12, 1)).astype(np.float32)
    m_fwd = rotation_matrix(jnp.asarray([30.0]), jnp.asarray([1.0]), (5.5, 5.5))
    out = np.asarray(
        warp_affine(jnp.asarray(labels), invert_affine(m_fwd), interpolation="nearest")
    )
    assert set(np.unique(out)).issubset(set(np.unique(labels)))  # no blending


def test_tta_round_trip_interior(rng):
    """invert(apply(x)) ~= x away from borders."""
    cfg = TTAConfig(hflip_p=1.0, rotation_limit=20.0, scale_limit=(0.0, 0.2))
    # smooth probability field: bilinear resampling is only near-invertible on
    # band-limited signals (same as the reference's cv2 round trip)
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    p1 = (0.3 + 0.4 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)).astype(np.float32)
    x = np.stack([np.stack([p1, 1 - p1], axis=-1)] * 3)
    params = sample_tta_params(cfg, jax.random.key(0), 3, 32, 32)
    back = np.asarray(invert_tta(apply_tta(jnp.asarray(x), params), params))
    inner = (slice(None), slice(8, 24), slice(8, 24), slice(None))
    np.testing.assert_allclose(back[inner], x[inner], atol=0.06)
    # simplex preserved everywhere
    np.testing.assert_allclose(back.sum(-1), 1.0, atol=1e-5)


def test_tta_augment_mult_zero_is_identity_distribution():
    cfg = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2), augment_mult=0.0)
    params = sample_tta_params(cfg, jax.random.key(1), 4, 16, 16)
    ident = np.broadcast_to(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (4, 2, 3))
    np.testing.assert_allclose(np.asarray(params.forward), ident, atol=1e-5)


def test_tta_params_differ_across_keys():
    cfg = TTAConfig()
    a = sample_tta_params(cfg, jax.random.key(0), 2, 16, 16)
    b = sample_tta_params(cfg, jax.random.key(1), 2, 16, 16)
    assert np.abs(np.asarray(a.forward) - np.asarray(b.forward)).max() > 1e-3


# ---- separable (two-pass) warp --------------------------------------------

from diffuncertainty_tpu.ops.warp import warp_affine_separable


def _smooth_images(b=3, h=32, w=32, c=2):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [np.sin(xx / 7 + k) * np.cos(yy / 5 - k) + 0.5 * np.sin((xx + yy) / 9)
         for k in range(c)], -1,
    )
    return jnp.asarray(np.broadcast_to(img, (b, h, w, c)).copy(), jnp.float32)


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_separable_exact_for_single_pass_warps(mode):
    """Identity, hflip, and translations are exact (one pass is a no-op or
    integer-aligned, so no double interpolation occurs)."""
    imgs = _smooth_images()
    b, h, w, _ = imgs.shape
    cases = [
        jnp.asarray([[1.0, 0, 0], [0, 1, 0]]),      # identity
        hflip_matrix(w),                              # pure flip
        jnp.asarray([[1.0, 0, 3], [0, 1, -2]]),      # integer translation
        jnp.asarray([[1.0, 0, 0.5], [0, 1, 0.25]]),  # fractional translation
    ]
    for m in cases:
        mb = jnp.broadcast_to(m, (b, 2, 3))
        exact = warp_affine(imgs, mb, border_mode=mode)
        sep = warp_affine_separable(imgs, mb, border_mode=mode, margin_x=w, margin_y=h)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(exact), atol=1e-5)


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_separable_close_on_smooth_rotation(mode, rng):
    """Interior error vs the single-resample warp stays at double-interpolation
    scale on band-limited content; constant-0 outside mask agrees exactly."""
    imgs = _smooth_images(b=4)
    b, h, w, _ = imgs.shape
    ang = jnp.asarray(rng.uniform(-22.5, 22.5, b), jnp.float32)
    sc = jnp.asarray(1 + rng.uniform(-0.2, 0.2, b), jnp.float32)
    m = invert_affine(rotation_matrix(ang, sc, ((w - 1) / 2, (h - 1) / 2)))
    exact = np.asarray(warp_affine(imgs, m, border_mode=mode))
    sep = np.asarray(warp_affine_separable(imgs, m, border_mode=mode, margin_x=w, margin_y=h))
    inner = (slice(None), slice(4, -4), slice(4, -4))
    assert np.abs(exact - sep)[inner].max() < 0.05
    if mode == "constant":
        # pixels the exact warp zeroes (source fully outside) are zero here too
        outside = np.abs(exact).max(-1) == 0.0
        assert np.abs(sep[outside]).max() < 1e-5


def test_separable_margin_helper_covers_offsets():
    from diffuncertainty_tpu.ops.warp import separable_margins

    mx, my = separable_margins(22.5, 0.8, 1.2, True, 128, 128)
    assert 0 < mx < 128 and 0 < my < 128
    # margins grow with rotation
    mx2, my2 = separable_margins(45.0, 0.8, 1.2, True, 128, 128)
    assert mx2 > mx and my2 > my


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_separable_nearest_exact_for_single_pass_warps(mode):
    """Identity / flip / translations: nearest separable == nearest composed."""
    rng = np.random.default_rng(11)
    labels = jnp.asarray(rng.integers(0, 5, (3, 32, 32, 1)), jnp.float32)
    b, h, w, _ = labels.shape
    cases = [
        jnp.asarray([[1.0, 0, 0], [0, 1, 0]]),
        hflip_matrix(w),
        jnp.asarray([[1.0, 0, 3], [0, 1, -2]]),
        jnp.asarray([[1.0, 0, 0.4], [0, 1, 0.25]]),  # fractional translation
    ]
    for m in cases:
        mb = jnp.broadcast_to(m, (b, 2, 3))
        exact = warp_affine(labels, mb, interpolation="nearest", border_mode=mode)
        sep = warp_affine_separable(labels, mb, interpolation="nearest",
                                    border_mode=mode, margin_x=w, margin_y=h)
        np.testing.assert_array_equal(np.asarray(sep), np.asarray(exact))


@pytest.mark.parametrize("mode", ["replicate", "constant"])
def test_separable_nearest_rotation_label_safe_and_close(mode):
    """Rotated/scaled label masks: values stay in the label set, agreement
    with the composed nearest warp except boundary-crossing pixels (the
    documented <= |m01/m11|/2 px coordinate perturbation)."""
    rng = np.random.default_rng(12)
    # piecewise-constant label regions (not iid noise, so disagreement
    # concentrates at region boundaries)
    base = np.zeros((4, 32, 32, 1), np.float32)
    base[:, 8:24, 6:20, 0] = 3.0
    base[:, 14:30, 18:30, 0] = 7.0
    labels = jnp.asarray(base)
    b, h, w, _ = labels.shape
    ang = jnp.asarray(rng.uniform(-22.5, 22.5, b), jnp.float32)
    sc = jnp.asarray(1 + rng.uniform(-0.2, 0.2, b), jnp.float32)
    m = invert_affine(rotation_matrix(ang, sc, ((w - 1) / 2, (h - 1) / 2)))
    exact = np.asarray(warp_affine(labels, m, interpolation="nearest",
                                   border_mode=mode))
    sep = np.asarray(warp_affine_separable(labels, m, interpolation="nearest",
                                           border_mode=mode, margin_x=w, margin_y=h))
    assert set(np.unique(sep)) <= {0.0, 3.0, 7.0}
    mismatch = np.mean(sep != exact)
    assert mismatch < 0.03, mismatch


def test_augment_batch_separable_matches_composed_semantics(rng):
    """The default separable augment pipeline stays close to the composed-warp
    pipeline under identical PRNG draws: identical label set, small image
    delta, boundary-bounded mask disagreement."""
    import dataclasses as dc

    from diffuncertainty_tpu.data.augment import TrainAugmentConfig, augment_batch

    cfg = TrainAugmentConfig(
        hflip_p=0.5, rotation_limit=20.0, scale_limit=(-0.15, 0.15),
        gauss_noise_var_limit=(0.0, 0.0), gauss_noise_p=0.0,
        mean=(0.0,), std=(1.0,),
    )
    images = jnp.asarray(np.concatenate([_smooth_images(1, c=3),
                                         _smooth_images(1, c=3) * 0.5]))
    # piecewise-constant mask (like real segmentations): disagreement between
    # the warp backends then concentrates on region boundaries. An iid-noise
    # mask would make every pixel a boundary and inflate the mismatch rate.
    mk = np.zeros((2, 32, 32), np.int32)
    mk[:, 8:26, 10:22] = 1
    masks = jnp.asarray(mk)
    key = jax.random.key(3)
    im_sep, mk_sep = augment_batch(cfg, key, images, masks)
    im_cmp, mk_cmp = augment_batch(
        dc.replace(cfg, separable_warp=False), key, images, masks)
    assert set(np.unique(np.asarray(mk_sep))) <= {0, 1}
    assert np.mean(np.asarray(mk_sep) != np.asarray(mk_cmp)) < 0.05
    # constant-0 border bleed differs between one and two interpolations for
    # pixels whose source taps touch the frame edge (<= ~6 px in at 20
    # degrees); the interior is double-interpolation-close
    inner = (slice(None), slice(6, -6), slice(6, -6))
    assert np.abs(np.asarray(im_sep) - np.asarray(im_cmp))[inner].max() < 0.05


def test_tta_separable_vs_exact_round_trip():
    """Both warp backends recover the interior and preserve the simplex."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    p1 = (0.3 + 0.4 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)).astype(np.float32)
    x = jnp.asarray(np.stack([np.stack([p1, 1 - p1], axis=-1)] * 3))
    inner = (slice(None), slice(8, 24), slice(8, 24), slice(None))
    for separable in (True, False):
        cfg = TTAConfig(hflip_p=1.0, rotation_limit=20.0, scale_limit=(0.0, 0.2),
                        separable_warp=separable)
        params = sample_tta_params(cfg, jax.random.key(0), 3, 32, 32)
        assert params.separable == separable
        back = np.asarray(invert_tta(apply_tta(x, params), params))
        np.testing.assert_allclose(back[inner], np.asarray(x)[inner], atol=0.08)
        np.testing.assert_allclose(back.sum(-1), 1.0, atol=1e-5)


def test_warp_backends_vs_cv2_reference_engine(rng):
    """Quantify the TTA warp delta against cv2.warpAffine — the engine the
    reference's TTA inversion actually uses (test_2D.py:174-288). The
    composed-resample warp must match cv2 to interpolation round-off; the
    separable warp adds the double-interpolation delta (bounded, interior)."""
    import cv2

    h = w = 64
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (np.sin(xx / 9) * np.cos(yy / 7) + 0.5 * np.sin((xx + yy) / 11)).astype(np.float32)
    imgs = jnp.asarray(np.broadcast_to(img[..., None], (4, h, w, 2)).copy())

    ang = rng.uniform(-22.5, 22.5, 4).astype(np.float32)
    sc = (1 + rng.uniform(-0.2, 0.2, 4)).astype(np.float32)
    m = np.asarray(invert_affine(rotation_matrix(jnp.asarray(ang), jnp.asarray(sc),
                                                 ((w - 1) / 2, (h - 1) / 2))))

    for mode, cv2_border in [("replicate", cv2.BORDER_REPLICATE),
                             ("constant", cv2.BORDER_CONSTANT)]:
        ours = np.asarray(warp_affine(imgs, jnp.asarray(m), border_mode=mode))
        sep = np.asarray(warp_affine_separable(
            imgs, jnp.asarray(m), border_mode=mode, margin_x=w, margin_y=h))
        for b in range(4):
            ref = cv2.warpAffine(
                np.asarray(imgs[b]), m[b], (w, h),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                borderMode=cv2_border, borderValue=0.0,
            )
            # composed warp == cv2 up to fixed-point interpolation round-off
            # (cv2 uses 5-bit fractional weights -> ~2^-5 * local variation)
            d_exact = np.abs(ours[b] - ref)
            assert d_exact.max() < 0.04, (mode, b, d_exact.max())
            # separable warp: double interpolation. Pointwise deltas are at
            # smoothing scale wherever the interpolation support is smooth —
            # i.e. away from the synthetic zero edge a constant border cuts
            # into the frame — so compare on pixels whose source is >=2 px
            # inside; globally the mean delta stays small.
            gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                                 np.arange(h, dtype=np.float64))
            sx = m[b, 0, 0] * gx + m[b, 0, 1] * gy + m[b, 0, 2]
            sy = m[b, 1, 0] * gx + m[b, 1, 1] * gy + m[b, 1, 2]
            inside = (sx >= 2) & (sx <= w - 3) & (sy >= 2) & (sy <= h - 3)
            d_sep = np.abs(sep[b] - ref)
            assert d_sep[inside].max() < 0.08, (mode, b, d_sep[inside].max())
            assert d_sep.mean() < 0.01, (mode, b, d_sep.mean())
