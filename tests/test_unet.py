"""DiffUnet structural/behavioral tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffuncertainty_tpu.models import DiffUnet, DropoutSpec


def small_unet(**kw):
    cfg = dict(
        in_channels=3,
        out_channels=2,
        model_channels=8,
        num_res_blocks=(1, 1),
        num_middle_res_blocks=1,
        attention_resolutions=(-1,),
        channel_mult=(1, 2),
        num_heads=2,
    )
    cfg.update(kw)
    return DiffUnet(**cfg)


def test_forward_shapes_and_zero_init():
    model = small_unet()
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.logits.shape == (2, 16, 16, 2)
    assert out.features.shape == (2, 16, 16, 8)
    # zero-initialised output conv => logits are exactly zero at init
    np.testing.assert_array_equal(np.asarray(out.logits), 0.0)


def test_diffusion_mode_requires_timesteps():
    model = small_unet(in_channels=5, diffusion=True)
    x = jnp.ones((2, 16, 16, 5))
    t = jnp.array([0.3, 0.7])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.logits.shape == (2, 16, 16, 2)
    with pytest.raises(ValueError):
        model.apply(params, x)  # missing timesteps


def test_new_upsample_method_add_skips():
    model = small_unet(new_upsample_method=True, one_skip_per_reso=True)
    x = jnp.ones((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.logits.shape == (1, 16, 16, 2)


def test_encoder_only_returns_features():
    model = small_unet(encoder_only=True)
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.logits is None
    # bottleneck at 2x downsample with channel_mult (1,2) -> (B, 8, 8, 16)
    assert out.features.shape == (2, 8, 8, 16)


def test_ssn_outputs():
    model = small_unet(ssn=True, ssn_rank=4)
    x = jnp.ones((2, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    n = 16 * 16 * 2
    assert out.ssn_mean.shape == (2, n)
    assert out.ssn_cov_diag.shape == (2, n)
    assert out.ssn_cov_factor.shape == (2, n, 4)
    assert np.all(np.asarray(out.ssn_cov_diag) >= 1e-5)
    out_mean = model.apply(params, x, mean_only=True)
    np.testing.assert_array_equal(np.asarray(out_mean.ssn_cov_factor), 0.0)


def _randomize(params, scale=0.1):
    """Perturb all params: zero-init convs otherwise mask dropout effects."""
    rng = np.random.default_rng(0)
    return jax.tree.map(
        lambda p: p + scale * jnp.asarray(rng.standard_normal(p.shape), p.dtype),
        params,
    )


def test_mc_dropout_is_stochastic_and_seeded():
    spec = DropoutSpec.from_config({"enabled": True, "probability": 0.5})
    model = small_unet(dropout_spec=spec)
    x = jnp.ones((2, 16, 16, 3))
    params = _randomize(
        model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    )

    def fwd(key):
        return model.apply(params, x, rngs={"dropout": key})

    a = fwd(jax.random.key(1))
    b = fwd(jax.random.key(2))
    a2 = fwd(jax.random.key(1))
    # same key -> identical (seeded-dropout members); different keys -> differ
    np.testing.assert_array_equal(np.asarray(a.features), np.asarray(a2.features))
    assert np.abs(np.asarray(a.features) - np.asarray(b.features)).max() > 0


def test_vmap_over_dropout_keys_gives_mc_samples():
    spec = DropoutSpec.from_config({"enabled": True, "probability": 0.3})
    model = small_unet(dropout_spec=spec)
    x = jnp.ones((1, 16, 16, 3))
    params = _randomize(
        model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
    )
    keys = jax.random.split(jax.random.key(7), 4)
    feats = jax.vmap(lambda k: model.apply(params, x, rngs={"dropout": k}).features)(keys)
    assert feats.shape == (4, 1, 16, 16, 8)
    flat = np.asarray(feats).reshape(4, -1)
    assert np.unique(flat, axis=0).shape[0] == 4


def test_no_dropout_needs_no_rng():
    model = small_unet()
    x = jnp.ones((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x)
    model.apply(params, x)  # must not require a dropout rng


@pytest.mark.slow
def test_unet16_config_param_count_scale():
    """unet16-like config (configs/network/unet16.yaml) builds and runs @64px."""
    model = DiffUnet(
        in_channels=3,
        out_channels=2,
        model_channels=32,
        num_res_blocks=(2, 2, 2, 2),
        num_middle_res_blocks=2,
        channel_mult=(1, 2, 4, 8),
        attention_resolutions=(-2, -1),
        num_heads=4,
    )
    x = jnp.ones((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # sanity: tens of millions is wrong, hundreds of thousands is wrong
    assert 1e6 < n_params < 50e6, n_params
    out = model.apply(params, x)
    assert out.logits.shape == (1, 64, 64, 2)
