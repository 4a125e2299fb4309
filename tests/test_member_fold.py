"""Member-folded stacked-ensemble execution (ops/member_fold.py).

The folded path replaces vmap-over-stacked-params (slow grouped convs on
TPU) with member-batched im2col matmuls; these tests pin it to the vmap
path's numbers exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.ops.member_fold import member_conv2d, member_dense
from diffuncertainty_tpu.ops.norm import group_norm_32
from diffuncertainty_tpu.sampling import SamplerSpec, TTAConfig, make_sampler

SMALL_NET = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
]


@pytest.mark.parametrize("kh,stride,pad", [(3, 1, 1), (3, 2, 1), (1, 1, 0)])
def test_member_conv_matches_per_member_lax_conv(kh, stride, pad):
    rng = np.random.default_rng(0)
    m, b, h, w, cin, cout = 3, 2, 8, 8, 5, 7
    x = jnp.asarray(rng.standard_normal((m * b, h, w, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((m, kh, kh, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((m, cout)), jnp.float32)

    got = member_conv2d(x, kernel, bias, stride=stride, pad=pad)

    xm = x.reshape(m, b, h, w, cin)
    refs = []
    for i in range(m):
        y = jax.lax.conv_general_dilated(
            xm[i], kernel[i], (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias[i]
        refs.append(y)
    ref = jnp.stack(refs).reshape(got.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_member_dense_matches_per_member_matmul():
    rng = np.random.default_rng(1)
    m, b, t, cin, cout = 4, 3, 6, 5, 9
    x = jnp.asarray(rng.standard_normal((m * b, t, cin)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((m, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((m, cout)), jnp.float32)
    got = member_dense(x, kernel, bias)
    xm = np.asarray(x).reshape(m, b, t, cin)
    ref = np.einsum("mbtc,mcd->mbtd", xm, np.asarray(kernel)) + np.asarray(bias)[:, None, None]
    np.testing.assert_allclose(np.asarray(got).reshape(m, b, t, cout), ref, atol=1e-5)


def test_group_norm_member_affine_matches_per_member():
    rng = np.random.default_rng(2)
    m, b, h, w, c = 3, 2, 4, 4, 8
    x = jnp.asarray(rng.standard_normal((m * b, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    got = group_norm_32(x, scale, bias, num_groups=4)
    xm = x.reshape(m, b, h, w, c)
    ref = jnp.stack([
        group_norm_32(xm[i], scale[i], bias[i], num_groups=4) for i in range(m)
    ]).reshape(got.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def _stacked(built, x, n_members, params=None):
    # per-member random noise: multiplicative or constant perturbations leave
    # the zero-init output conv class-symmetric (uniform softmax, degenerate)
    if params is None:
        params = built.module.init({"params": jax.random.key(0)}, x)
    counter = iter(range(10_000))

    def stack(p):
        k = jax.random.key(1000 + next(counter))
        return jnp.stack([
            p + 0.05 * jax.random.normal(jax.random.fold_in(k, i), p.shape, p.dtype)
            for i in range(n_members)
        ])

    return jax.tree.map(stack, params)


def test_folded_stack_sampler_matches_vmap_stack_deterministic():
    """softmax AU, no TTA/dropout: folded and vmap paths must agree."""
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="none",
        overrides=SMALL_NET + ["network.attention_resolutions=[0,1]"],
    )
    built = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(3).random((4, 32, 32, 3)), jnp.float32)
    stacked = _stacked(built, x, 4)
    kw = dict(n_pred=1, n_members=4, member_mode="params_stack")
    ref = jax.jit(make_sampler(built, SamplerSpec(member_fold=False, **kw)))(
        stacked, x, jax.random.key(1))
    got = jax.jit(make_sampler(built, SamplerSpec(member_fold=True, **kw)))(
        stacked, x, jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(got.groups), np.asarray(ref.groups), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean), atol=2e-5)


def test_folded_stack_sampler_tta_runs_and_groups_correctly():
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="dropout",
        overrides=SMALL_NET + ["network.attention_resolutions=[-1]"],
    )
    built = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(4).random((2, 32, 32, 3)), jnp.float32)
    stacked = _stacked(built, x, 3)
    sampler = make_sampler(built, SamplerSpec(
        n_pred=2, n_members=3, member_mode="params_stack", member_fold=True,
        tta=True, tta_config=TTAConfig(hflip_p=0.5, rotation_limit=15.0),
    ))
    out = jax.jit(sampler)(stacked, x, jax.random.key(2))
    assert out.groups.shape[:3] == (3, 2, 2)
    assert np.isfinite(np.asarray(out.mean)).all()
    s = np.asarray(out.groups).sum(axis=-1)
    np.testing.assert_allclose(s, np.ones_like(s), atol=1e-3)
    # distinct members -> distinct group means
    gm = np.asarray(out.group_means)
    assert np.abs(gm[0] - gm[1]).max() > 1e-4


def test_folded_stack_diffusion_sampler_runs():
    cfg = load_config(
        data="toy64", network="unet4", model="diffusion", eu_method="none",
        overrides=SMALL_NET + [
            "network.attention_resolutions=[-1]",
            "model.diffusion_sampling.num_steps=2",
        ],
    )
    built = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(5).random((2, 32, 32, 3)), jnp.float32)
    xin = jnp.ones((1, 32, 32, built.module.in_channels), jnp.float32)
    params = built.module.init({"params": jax.random.key(0)}, xin, jnp.zeros((1,)))
    stacked = _stacked(built, None, 2, params=params)
    sampler = make_sampler(built, SamplerSpec(
        n_pred=2, n_members=2, member_mode="params_stack", member_fold=True,
        diffusion_sampler="ddim", diffusion_num_steps=2,
    ))
    out = jax.jit(sampler)(stacked, x, jax.random.key(6))
    assert out.groups.shape[:3] == (2, 2, 2)
    assert np.isfinite(np.asarray(out.mean)).all()


def test_member_fold_ignored_keeps_chunked_execution():
    """member_fold=True with unmet conditions (same_dropout) must fall back
    to normal execution WITH the requested member chunking — the flag must
    not silently discard member_chunk (an HBM knob) when the fold doesn't
    engage."""
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="dropout",
        overrides=SMALL_NET,
    )
    built = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(8).random((2, 32, 32, 3)), jnp.float32)
    stacked = _stacked(
        built, None, 3,
        params=built.module.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x),
    )
    kw = dict(n_pred=1, n_members=3, member_mode="params_stack",
              same_dropout=True)
    plain = make_sampler(built, SamplerSpec(member_chunk=2, **kw))
    folded_req = make_sampler(
        built, SamplerSpec(member_chunk=2, member_fold=True, **kw))
    a = jax.jit(plain)(stacked, x, jax.random.key(4))
    b = jax.jit(folded_req)(stacked, x, jax.random.key(4))
    # identical execution (fold ignored, chunk honored) => identical numbers
    np.testing.assert_array_equal(np.asarray(a.groups), np.asarray(b.groups))


def test_member_conv_taps_branch_matches_im2col(monkeypatch):
    """The HBM-bounded sum-of-taps formulation must equal the im2col one."""
    import diffuncertainty_tpu.ops.member_fold as mf

    rng = np.random.default_rng(6)
    m, b, h, w, cin, cout = 3, 2, 8, 8, 5, 7
    x = jnp.asarray(rng.standard_normal((m * b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((m, 3, 3, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((m, cout)), jnp.float32)
    ref = mf.member_conv2d(x, k, bias, stride=2, pad=1)
    monkeypatch.setattr(mf, "_MAX_PATCH_ELEMS", 1)
    got = mf.member_conv2d(x, k, bias, stride=2, pad=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
