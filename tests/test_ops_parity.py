"""Op-level numerical parity vs torch CPU.

These lock down the semantics that the reference model relies on implicitly
through PyTorch: GroupNorm eps/fp32 internals, interpolation alignment,
attention scaling/softmax, conv padding placement.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from diffuncertainty_tpu.ops import (
    group_norm_32,
    timestep_embedding,
    qkv_attention,
    upsample2x,
    downsample_avgpool2x,
    uncertainty_heatmaps,
    one_minus_msr,
)


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize("channels", [8, 32, 64, 48])
def test_group_norm_32_matches_torch(rng, channels):
    x = rng.standard_normal((2, channels, 6, 5)).astype(np.float32)
    groups = 32 if channels % 32 == 0 else channels
    gn = torch.nn.GroupNorm(groups, channels)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(rng.standard_normal(channels).astype(np.float32)))
        gn.bias.copy_(torch.from_numpy(rng.standard_normal(channels).astype(np.float32)))
        ref = gn(torch.from_numpy(x)).numpy()
    got = group_norm_32(
        jnp.asarray(to_nhwc(x)),
        jnp.asarray(gn.weight.detach().numpy()),
        jnp.asarray(gn.bias.detach().numpy()),
    )
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, atol=1e-5, rtol=1e-5)


def test_timestep_embedding_matches_reference_formula(rng):
    import math

    t = rng.random(7).astype(np.float32)
    dim = 32
    half = dim // 2
    freqs = np.exp(-math.log(10.0) * np.arange(half, dtype=np.float32) / half)
    args = t[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(got, ref, atol=5e-6)


@pytest.mark.parametrize("heads", [1, 2, 4])
def test_qkv_attention_matches_torch_legacy_split(rng, heads):
    b, c, t = 2, 16, 12
    qkv_ct = rng.standard_normal((b, 3 * c, t)).astype(np.float32)

    # torch reference computation (diff_unet2D_module.py:808-822)
    qkv_t = torch.from_numpy(qkv_ct).reshape(b * heads, -1, t)
    ch = qkv_t.shape[1] // 3
    q, k, v = torch.split(qkv_t, ch, dim=1)
    scale = 1 / (ch ** 0.25)
    weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
    weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
    ref = torch.einsum("bts,bcs->bct", weight, v).reshape(b, -1, t).numpy()

    qkv_tc = np.transpose(qkv_ct, (0, 2, 1))  # (B, T, 3C) token-major
    got = np.asarray(qkv_attention(jnp.asarray(qkv_tc), heads))
    np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
@pytest.mark.parametrize("hw", [(4, 6), (5, 3)])
def test_upsample2x_matches_torch(rng, mode, hw):
    h, w = hw
    x = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode=mode, **kwargs).numpy()
    got = upsample2x(jnp.asarray(to_nhwc(x)), method=mode)
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, atol=1e-6)


def test_downsample_avgpool_matches_torch(rng):
    x = rng.standard_normal((2, 3, 8, 6)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), 2).numpy()
    got = downsample_avgpool2x(jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv3x3_padding_matches_torch(rng, stride):
    """flax Conv with explicit ((1,1),(1,1)) padding == torch Conv2d(padding=1)."""
    import flax.linen as nn

    x = rng.standard_normal((1, 5, 8, 8)).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, 3, stride=stride, padding=1)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    conv = nn.Conv(7, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)))
    # torch weight OIHW -> flax HWIO
    kernel = np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    got = conv.apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(np.asarray(got)), ref, atol=1e-5, rtol=1e-5)


def test_uncertainty_heatmaps_match_reference_loop(rng):
    """TU/AU/EU vs the reference's per-class python-loop computation."""
    p = rng.random((5, 3, 4, 4)).astype(np.float32)
    p /= p.sum(axis=1, keepdims=True)
    # include exact zeros to exercise the NaN-masked p*log(p) path
    p[0, 0, 0, 0] = 0.0
    p[0, 1, 0, 0] = 0.6
    p[0, 2, 0, 0] = 0.4

    mean = p.mean(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        tu = -np.nansum(mean * np.log(mean), axis=0)
        au = np.nanmean(-np.nansum(p * np.log(p), axis=1), axis=0)
    out = uncertainty_heatmaps(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(out["TU"]), tu, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["AU"]), au, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["EU"]), tu - au, atol=1e-6)
    assert np.all(np.asarray(out["TU"]) >= -1e-6)


def test_one_minus_msr(rng):
    p = rng.random((3, 4, 4)).astype(np.float32)
    got = np.asarray(one_minus_msr(jnp.asarray(p)))
    np.testing.assert_allclose(got, 1.0 - p.max(axis=0), atol=1e-7)


def test_devices_available():
    assert len(jax.devices()) == 8
