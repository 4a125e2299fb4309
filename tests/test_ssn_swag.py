"""SSN distribution and SWAG posterior tests."""

import importlib.util

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.models import ssn, swag


# --------------------------------------------------------------------------
# SSN
# --------------------------------------------------------------------------

def _make_dist(rng, b=2, n=12, r=3):
    mean = rng.standard_normal((b, n)).astype(np.float32)
    diag = (0.5 + rng.random((b, n))).astype(np.float32)
    factor = (0.3 * rng.standard_normal((b, n, r))).astype(np.float32)
    return mean, diag, factor


def test_ssn_log_prob_matches_torch(rng):
    import torch

    mean, diag, factor = _make_dist(rng)
    value = rng.standard_normal(mean.shape).astype(np.float32)
    ref = torch.distributions.LowRankMultivariateNormal(
        torch.from_numpy(mean).double(),
        torch.from_numpy(factor).double(),
        torch.from_numpy(diag).double(),
    ).log_prob(torch.from_numpy(value).double()).numpy()
    dist = ssn.build_distribution(jnp.asarray(mean), jnp.asarray(diag), jnp.asarray(factor))
    assert not bool(np.any(np.asarray(dist.cov_failed)))
    got = np.asarray(ssn.log_prob(dist, jnp.asarray(value)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ssn_sample_statistics(rng):
    mean, diag, factor = _make_dist(rng, b=1, n=6, r=2)
    dist = ssn.build_distribution(jnp.asarray(mean), jnp.asarray(diag), jnp.asarray(factor))
    samples = np.asarray(ssn.sample_n(dist, jax.random.key(0), 20000))[:, 0]  # (S, N)
    emp_mean = samples.mean(axis=0)
    emp_cov = np.cov(samples.T)
    true_cov = np.diag(diag[0]) + factor[0] @ factor[0].T
    np.testing.assert_allclose(emp_mean, mean[0], atol=0.05)
    np.testing.assert_allclose(emp_cov, true_cov, atol=0.08)


def test_ssn_nan_inputs_trigger_fallback(rng):
    mean, diag, factor = _make_dist(rng)
    factor[0, 0, 0] = np.nan
    dist = ssn.build_distribution(jnp.asarray(mean), jnp.asarray(diag), jnp.asarray(factor))
    failed = np.asarray(dist.cov_failed)
    assert failed[0] and not failed[1]
    # fallback zeroes the factor -> sampling still finite
    s = np.asarray(ssn.sample(dist, jax.random.key(0)))
    assert np.all(np.isfinite(s))


# --------------------------------------------------------------------------
# SWAG
# --------------------------------------------------------------------------

def _collect_snapshots(snapshots, max_k, diag_only=False):
    state = swag.init(snapshots[0], max_num_models=max_k, diag_only=diag_only)
    for p in snapshots:
        state = swag.collect(state, p, max_num_models=max_k)
    return state


def test_swag_moments_match_reference():
    """Running moments equal the reference recursion for a scalar pytree."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_swag", "/root/reference/uncertainty_modeling/unc_mod_utils/swag.py"
    )
    ref_swag_mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref_swag_mod)
    except Exception:
        pytest.skip("reference swag unavailable")

    torch_model = torch.nn.Linear(3, 2)
    ref = ref_swag_mod.SWAG(diag_only=False, max_num_models=4)
    rng = np.random.default_rng(0)
    snapshots = []
    for _ in range(6):  # exceeds max_k -> exercises FIFO
        w = rng.standard_normal((2, 3)).astype(np.float32)
        b = rng.standard_normal(2).astype(np.float32)
        with torch.no_grad():
            torch_model.weight.copy_(torch.from_numpy(w))
            torch_model.bias.copy_(torch.from_numpy(b))
        ref.collect_model(torch_model)
        snapshots.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})

    state = _collect_snapshots(snapshots, max_k=4)
    np.testing.assert_allclose(
        np.asarray(state.mean["w"]), ref.buffer_mean_0.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.sq_mean["b"]), ref.buffer_sq_mean_1.numpy(), rtol=1e-5
    )
    # deviation rows: same SET of rows (ring vs FIFO ordering may differ)
    ref_rows = ref.buffer_cov_mat_sqrt_0.numpy()  # (4, 6)
    got_rows = np.asarray(state.dev["w"]).reshape(4, -1)
    ref_sorted = ref_rows[np.lexsort(ref_rows.T)]
    got_sorted = got_rows[np.lexsort(got_rows.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, atol=1e-6)


def test_swag_fullrank_sample_algebra(monkeypatch):
    """With all-ones noise, the sample must equal the closed-form expression."""
    max_k = 3
    rng = np.random.default_rng(1)
    snaps = [{"w": jnp.asarray(rng.standard_normal((4,)).astype(np.float32))} for _ in range(3)]
    state = _collect_snapshots(snaps, max_k=max_k)

    ones_normal = lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)
    monkeypatch.setattr(jax.random, "normal", ones_normal)
    got = swag.sample(state, jax.random.key(0), max_num_models=max_k, scale=1.0, use_low_rank=True)

    mean = np.asarray(state.mean["w"])
    var = np.maximum(np.asarray(state.sq_mean["w"]) - mean**2, 1e-30)
    dev = np.asarray(state.dev["w"])  # (3, 4), all rows valid
    expected = mean + (np.sqrt(var) + dev.sum(axis=0) / np.sqrt(max_k - 1))
    np.testing.assert_allclose(np.asarray(got["w"]), expected, rtol=1e-5)


def test_swag_ring_masks_uncollected_rows(monkeypatch):
    """With fewer snapshots than max_k, unwritten dev rows must not leak."""
    max_k = 5
    snaps = [{"w": jnp.full((3,), float(i))} for i in range(2)]
    state = _collect_snapshots(snaps, max_k=max_k)
    ones_normal = lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)
    monkeypatch.setattr(jax.random, "normal", ones_normal)
    got = np.asarray(
        swag.sample(state, jax.random.key(0), max_num_models=max_k, use_low_rank=True)["w"]
    )
    mean = np.asarray(state.mean["w"])
    var = np.maximum(np.asarray(state.sq_mean["w"]) - mean**2, 1e-30)
    dev = np.asarray(state.dev["w"])[:2]  # only collected rows
    expected = mean + (np.sqrt(var) + dev.sum(axis=0) / np.sqrt(max_k - 1))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_swag_member_stack_vmaps():
    rng = np.random.default_rng(2)
    snaps = [
        {"w": jnp.asarray(rng.standard_normal((2, 2)).astype(np.float32))}
        for _ in range(4)
    ]
    state = _collect_snapshots(snaps, max_k=4)
    members = swag.sample_members(state, jax.random.key(0), 6, max_num_models=4)
    assert members["w"].shape == (6, 2, 2)
    flat = np.asarray(members["w"]).reshape(6, -1)
    assert np.unique(flat, axis=0).shape[0] == 6  # all draws distinct


def test_swag_diag_only():
    snaps = [{"w": jnp.asarray(np.float32([i, 2 * i]))} for i in range(3)]
    state = _collect_snapshots(snaps, max_k=3, diag_only=True)
    assert state.dev is None
    s = swag.sample(state, jax.random.key(0), max_num_models=3, use_low_rank=False)
    assert np.all(np.isfinite(np.asarray(s["w"])))
    with pytest.raises(ValueError):
        swag.sample(state, jax.random.key(0), max_num_models=3, use_low_rank=True)
