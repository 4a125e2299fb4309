"""PredictionSampler tests: axes, grouping semantics, determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.sampling import SamplerSpec, make_sampler

SMALL = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
    "model.diffusion_sampling.num_steps=3",
]


def _built(model="softmax", eu="none", extra=()):
    cfg = load_config(data="toy64", network="unet4", model=model, eu_method=eu,
                      overrides=SMALL + list(extra))
    return build_model(cfg)


def _init(built, b=2, hw=16):
    x = jnp.ones((b, hw, hw, 3))
    rngs = {"params": jax.random.key(0)}
    if built.needs_dropout_rng:
        rngs["dropout"] = jax.random.key(1)
    if built.au_type == "diffusion":
        xd = jnp.ones((b, hw, hw, built.module.in_channels))
        return built.module.init(rngs, xd, jnp.zeros((b,)))
    if built.au_type == "prob_unet":
        segm = jnp.zeros((b, hw, hw, built.num_classes))
        return built.module.init(rngs, x, segm, built.module.init_input_latent(b))
    return built.module.init(rngs, x)


def _run(built, spec, params=None, b=2, hw=16, seed=0):
    params = params if params is not None else _init(built, b, hw)
    fn = make_sampler(built, spec)
    images = jnp.asarray(np.random.default_rng(3).random((b, hw, hw, 3)), jnp.float32)
    stack = fn(params, images, jax.random.key(seed))
    return fn, stack


def _assert_stack(stack, g, s, b=2, hw=16, c=2):
    assert stack.groups.shape == (g, s, b, hw, hw, c)
    assert stack.group_means.shape == (g, b, hw, hw, c)
    assert stack.mean.shape == (b, hw, hw, c)
    arr = np.asarray(stack.groups)
    np.testing.assert_allclose(arr.sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stack.mean), np.asarray(stack.group_means).mean(0), atol=1e-6
    )


def test_softmax_single_member():
    built = _built()
    fn, stack = _run(built, SamplerSpec(n_pred=5))
    assert fn.meta.n_groups == 1 and fn.meta.samples_per_group == 1
    _assert_stack(stack, 1, 1)


def test_softmax_tta_singleton_groups():
    built = _built()
    fn, stack = _run(built, SamplerSpec(n_pred=4, tta=True))
    # single member + generative-style sampling -> per-sample singleton groups
    assert fn.meta.n_groups == 4 and fn.meta.samples_per_group == 1
    assert fn.meta.group_is_generative == (False,) * 4  # TTA is not generative
    _assert_stack(stack, 4, 1)


def test_ssn_multi_member_params_stack():
    built = _built(model="ssn")
    params = _init(built)
    stacked = jax.tree.map(lambda p: jnp.stack([p, p, p]), params)
    fn, stack = _run(
        built,
        SamplerSpec(n_pred=3, n_members=3, member_mode="params_stack"),
        params=stacked,
    )
    # 3 generative members -> per-member groups of n_pred
    assert fn.meta.n_groups == 3 and fn.meta.samples_per_group == 3
    assert fn.meta.group_is_generative == (True, True, True)
    _assert_stack(stack, 3, 3)


def test_ssn_single_member_splits_to_singletons():
    built = _built(model="ssn")
    fn, stack = _run(built, SamplerSpec(n_pred=4))
    assert fn.meta.n_groups == 4 and fn.meta.samples_per_group == 1
    _assert_stack(stack, 4, 1)


def test_diffusion_sampler_runs():
    built = _built(model="diffusion")
    # randomize params: zero-init output conv makes the model constant at
    # init, which would hide trajectory-noise differences
    fn, stack = _run(built, SamplerSpec(n_pred=2), params=_randomized(built))
    _assert_stack(stack, 2, 1)
    # distinct trajectories
    arr = np.asarray(stack.groups).reshape(2, -1)
    assert np.abs(arr[0] - arr[1]).max() > 1e-6


def test_prob_unet_sampler_runs():
    built = _built(model="prob_unet")
    fn, stack = _run(built, SamplerSpec(n_pred=3))
    _assert_stack(stack, 3, 1)


def _randomized(built, seed=0):
    params = _init(built)
    prng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda p: p + 0.05 * jnp.asarray(prng.standard_normal(p.shape), p.dtype), params
    )


def test_dropout_members_and_same_dropout():
    built = _built(eu="dropout")
    spec = SamplerSpec(n_pred=1, n_members=4, member_mode="dropout")
    fn, stack = _run(built, spec, params=_randomized(built))
    assert fn.meta.n_groups == 4 and fn.meta.samples_per_group == 1
    arr = np.asarray(stack.groups).reshape(4, -1)
    assert np.unique(arr, axis=0).shape[0] == 4  # members differ

    # determinism: same rng -> identical stack
    params = _init(built)
    fn2 = make_sampler(built, spec)
    images = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3)), jnp.float32)
    s1 = fn2(params, images, jax.random.key(9))
    s2 = fn2(params, images, jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(s1.groups), np.asarray(s2.groups))


def test_same_dropout_reuses_mask_across_tta_samples():
    built = _built(eu="dropout")
    # TTA off and same member key: with same_dropout, the (only) dropout draw
    # per member is the member key; two TTA rounds of the same member share it.
    spec = SamplerSpec(n_pred=2, n_members=2, member_mode="dropout",
                       tta=True, same_dropout=True,
                       )
    fn, stack = _run(built, spec)
    assert stack.groups.shape[0] == 2 and stack.groups.shape[1] == 2


def test_discretize_one_hots_samples():
    built = _built(model="ssn")
    fn, stack = _run(built, SamplerSpec(n_pred=3, discretize=True))
    arr = np.asarray(stack.groups)
    assert set(np.unique(arr)).issubset({0.0, 1.0})
    np.testing.assert_allclose(arr.sum(-1), 1.0, atol=0)


def test_direct_au_forces_singletons():
    built = _built(model="ssn")
    params = _init(built)
    stacked = jax.tree.map(lambda p: jnp.stack([p, p]), params)
    spec = SamplerSpec(n_pred=3, n_members=2, member_mode="params_stack", direct_au=True)
    fn, stack = _run(built, spec, params=stacked)
    assert fn.meta.n_groups == 6 and fn.meta.samples_per_group == 1


def test_sampler_is_jittable():
    built = _built(model="ssn")
    params = _init(built)
    fn = make_sampler(built, SamplerSpec(n_pred=2))
    jfn = jax.jit(fn)
    images = jnp.ones((2, 16, 16, 3))
    out = jfn(params, images, jax.random.key(0))
    assert out.groups.shape == (2, 1, 2, 16, 16, 2)


def test_member_chunking_matches_full_vmap():
    built = _built(eu="dropout")
    params = _randomized(built)
    images = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3)), jnp.float32)
    # chunking is a memory knob on the vmap path; compare against the
    # unchunked vmap structure (flat_fold=False), which shares key derivation
    full = make_sampler(built, SamplerSpec(
        n_pred=1, n_members=4, member_mode="dropout", flat_fold=False))
    chunked = make_sampler(
        built, SamplerSpec(n_pred=1, n_members=4, member_mode="dropout", member_chunk=2)
    )
    a = full(params, images, jax.random.key(5))
    b = chunked(params, images, jax.random.key(5))
    np.testing.assert_allclose(
        np.asarray(a.groups), np.asarray(b.groups), atol=1e-6
    )


def test_params_stack_member_scan_matches_vmap():
    """chunk=1 (the TPU "auto" default for stacked ensembles — a member-scan
    of plain dense programs, measured faster than vmap's grouped convs) must
    reproduce the vmap path's numbers."""
    built = _built(eu="dropout")
    params = _randomized(built)
    stacked = jax.tree.map(
        lambda p: jnp.stack([p + 0.01 * i for i in range(3)]), params
    )
    images = jnp.asarray(np.random.default_rng(9).random((2, 16, 16, 3)), jnp.float32)
    kw = dict(n_pred=2, n_members=3, member_mode="params_stack", tta=True)
    vmapped = make_sampler(built, SamplerSpec(member_chunk=None, **kw))
    scanned = make_sampler(built, SamplerSpec(member_chunk=1, **kw))
    a = vmapped(stacked, images, jax.random.key(5))
    b = scanned(stacked, images, jax.random.key(5))
    np.testing.assert_allclose(
        np.asarray(a.groups), np.asarray(b.groups), atol=1e-6
    )


def test_flat_fold_matches_vmap_when_deterministic():
    """With no stochastic ops (no dropout, no TTA), the flat-fold path and the
    nested-vmap path are the same pure forward and must agree exactly."""
    built = _built()  # softmax, eu=none
    params = _randomized(built)
    images = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3)), jnp.float32)
    flat = make_sampler(built, SamplerSpec(n_pred=1))
    vmapped = make_sampler(built, SamplerSpec(n_pred=1, flat_fold=False))
    a = flat(params, images, jax.random.key(0))
    b = vmapped(params, images, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(a.groups), np.asarray(b.groups), atol=1e-6)


def test_flat_fold_dropout_members_distinct_and_stable():
    """Flat-fold dropout members draw independent masks per member and the
    whole stack is deterministic in the rng."""
    built = _built(eu="dropout")
    params = _randomized(built)
    images = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3)), jnp.float32)
    fn = make_sampler(built, SamplerSpec(n_pred=1, n_members=4, member_mode="dropout"))
    a = fn(params, images, jax.random.key(7))
    b = fn(params, images, jax.random.key(7))
    np.testing.assert_allclose(np.asarray(a.groups), np.asarray(b.groups), atol=0)
    arr = np.asarray(a.groups).reshape(4, -1)
    for i in range(3):
        assert np.abs(arr[i] - arr[i + 1]).max() > 1e-6
