"""Parity tests for the diffusion process vs the reference implementation.

The reference module (torch CPU) is imported read-only from /root/reference
purely as a test oracle; skipped when unavailable.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.models.diffusion import (
    ContinuousGaussianDiffusion,
    GammaSchedule,
)

REF_PATH = "/root/reference/uncertainty_modeling/models"


@pytest.fixture(scope="module")
def refdiff():
    sys.path.insert(0, REF_PATH)
    try:
        import diffusion as ref
    except Exception:
        pytest.skip("reference diffusion module unavailable")
    finally:
        sys.path.remove(REF_PATH)
    return ref


@pytest.mark.parametrize("name", ["linear", "cosine", "linear_simple", "parabola"])
@pytest.mark.parametrize("b", [0.1, 1.0])
def test_gamma_schedule_matches_reference(refdiff, name, b):
    import torch

    ref_gamma = refdiff.get_named_gamma_schedule(name, b=b, logsnr_min=-10.0, logsnr_max=10.0)
    gs = GammaSchedule(name, input_scale=b, logsnr_min=-10.0, logsnr_max=10.0)
    t = np.linspace(0.0, 1.0, 23)
    ref_vals = np.array([float(ref_gamma(torch.tensor(ti, dtype=torch.float64))) for ti in t])
    np.testing.assert_allclose(gs.gamma_np(t), ref_vals, rtol=1e-7)
    # device float32 path close to float64 truth (training only; the reverse
    # sampler uses float64 host constants, not this path)
    dev_vals = np.asarray(gs.gamma(jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(dev_vals, ref_vals, atol=3e-5)


@pytest.mark.parametrize("pred_type", ["EPS", "X", "V", "BOTH"])
def test_get_predictions_matches_reference(refdiff, pred_type, rng):
    import torch

    proc_ref = refdiff.ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, model_pred_type=pred_type,
        weights_type="uniform", var_type="large", decouple_loss_weights=False,
    )
    proc = ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, model_pred_type=pred_type,
        weights_type="uniform", var_type="large", decouple_loss_weights=False,
    )
    b, h, w, c = 3, 4, 4, 2
    out_c = 2 * c if pred_type == "BOTH" else c
    x_t = rng.standard_normal((b, c, h, w)).astype(np.float32)
    output = rng.standard_normal((b, out_c, h, w)).astype(np.float32)
    t = rng.random(b).astype(np.float32)
    alpha = proc.gamma_schedule.gamma_np(t) ** 0.5
    sigma = (1 - proc.gamma_schedule.gamma_np(t)) ** 0.5

    ref_x, ref_eps = proc_ref.get_predictions(
        torch.from_numpy(output), torch.from_numpy(x_t),
        torch.from_numpy(alpha.astype(np.float32)), torch.from_numpy(sigma.astype(np.float32)),
    )
    got_x, got_eps = proc.get_predictions(
        jnp.asarray(np.transpose(output, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x_t, (0, 2, 3, 1))),
        jnp.asarray(alpha.astype(np.float32)),
        jnp.asarray(sigma.astype(np.float32)),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_x), (0, 3, 1, 2)), ref_x.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_eps), (0, 3, 1, 2)), ref_eps.numpy(), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("weights_type", ["SNR", "SNR_plus1", "SNR_trunc", "uniform", "sigmoid_-4"])
@pytest.mark.parametrize("decouple", [False, True])
def test_loss_weights_match_reference(refdiff, weights_type, decouple):
    import torch

    proc_ref = refdiff.ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, weights_type=weights_type,
        decouple_loss_weights=decouple,
    )
    proc = ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, weights_type=weights_type,
        decouple_loss_weights=decouple,
    )
    t = np.linspace(0.05, 0.95, 7).astype(np.float32)
    ref = proc_ref.loss_weights(torch.from_numpy(t).double()).numpy()
    got = np.asarray(proc.loss_weights(jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_masked_mse_loss_matches_reference(refdiff, rng):
    import torch

    proc_ref = refdiff.ContinuousGaussianDiffusion(weights_type="uniform", decouple_loss_weights=False)
    proc = ContinuousGaussianDiffusion(weights_type="uniform", decouple_loss_weights=False)
    b, c, h, w = 2, 3, 4, 4
    pred = rng.standard_normal((b, c, h, w)).astype(np.float32)
    gt = rng.standard_normal((b, c, h, w)).astype(np.float32)
    mask = (rng.random((b, c, h, w)) > 0.3).astype(np.float32)
    t = rng.random(b).astype(np.float32)

    ref_losses = proc_ref.get_losses(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(t), torch.from_numpy(mask)
    ).numpy()
    got = np.asarray(
        proc.loss_weights(jnp.asarray(t))
        * proc._masked_loss(
            jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(gt, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(mask, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(got, ref_losses, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sampler", ["ddim", "ddpm"])
@pytest.mark.parametrize("var_type", ["small", "large"])
def test_sample_loop_matches_reference_with_linear_model(refdiff, sampler, var_type, rng):
    """Run both reverse samplers with a deterministic pseudo-model.

    The model returns 0.3 * x_t_channels + 0.1 * im, so trajectories are fully
    deterministic given x_init (ddpm noise is zeroed by monkeypatching
    torch.randn_like and using a zeros-noise rng wrapper on our side is not
    possible — instead we compare ddpm *means* via the small/large variance
    coefficients by zeroing the noise on both sides).
    """
    import torch

    b, c, h, w = 2, 2, 4, 4
    num_steps = 7
    x_init = rng.standard_normal((b, c, h, w)).astype(np.float32)
    im = rng.standard_normal((b, 1, h, w)).astype(np.float32)

    def torch_model(x_with_im, t):
        x_part = x_with_im[:, :c]
        im_part = x_with_im[:, c:]
        return 0.3 * x_part + 0.1 * im_part.repeat(1, c, 1, 1)

    proc_ref = refdiff.ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, model_pred_type="X",
        weights_type="uniform", var_type=var_type, decouple_loss_weights=False,
    )
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        ref_out = proc_ref.sample_loop(
            torch_model, torch.from_numpy(x_init), torch.from_numpy(im),
            num_steps, sampler_type=sampler,
        ).numpy()
    finally:
        torch.randn_like = orig_randn_like

    proc = ContinuousGaussianDiffusion(
        schedule_name="cosine", input_scale=0.1, model_pred_type="X",
        weights_type="uniform", var_type=var_type, decouple_loss_weights=False,
    )

    def jax_model(x_with_im, t):
        x_part = x_with_im[..., :c]
        im_part = x_with_im[..., c:]
        return 0.3 * x_part + 0.1 * jnp.repeat(im_part, c, axis=-1)

    # zero-noise: replace the normal draw by running ddpm with a rng but
    # then checking against the deterministic mean — easiest is to patch
    # jax.random.normal locally.
    orig_normal = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    try:
        got = proc.sample_loop(
            jax_model,
            jnp.asarray(np.transpose(x_init, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(im, (0, 2, 3, 1))),
            num_steps,
            rng=jax.random.key(0),
            sampler_type=sampler,
        )
    finally:
        jax.random.normal = orig_normal
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref_out, atol=2e-5, rtol=1e-4
    )


def test_sample_loop_vmaps_over_keys():
    """n_pred trajectories via vmap over PRNG keys — all distinct."""
    proc = ContinuousGaussianDiffusion(model_pred_type="X")
    c = 2

    def jax_model(x_with_im, t):
        return 0.5 * x_with_im[..., :c]

    im = jnp.ones((1, 4, 4, 1))

    def one(key):
        k1, k2 = jax.random.split(key)
        x_init = jax.random.normal(k1, (1, 4, 4, c))
        return proc.sample_loop(jax_model, x_init, im, 5, rng=k2)

    out = jax.vmap(one)(jax.random.split(jax.random.key(0), 3))
    assert out.shape == (3, 1, 4, 4, c)
    flat = np.asarray(out).reshape(3, -1)
    assert np.unique(flat, axis=0).shape[0] == 3


def test_train_loss_step_runs_and_is_finite():
    proc = ContinuousGaussianDiffusion(model_pred_type="X", weights_type="uniform",
                                       decouple_loss_weights=False)
    c = 2

    def model_fn(x_with_im, t):
        return jnp.tanh(x_with_im[..., :c])

    x = jax.nn.one_hot(jnp.zeros((2, 8, 8), jnp.int32), c)
    im = jnp.ones((2, 8, 8, 1))
    loss, pred_x = proc.train_loss_step(model_fn, x, im, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert pred_x.shape == x.shape
