"""Stochastic Segmentation Networks: low-rank multivariate normal over logits.

Reference: ``diff_unet2D_module.py:555-599`` builds a
``torch.distributions.LowRankMultivariateNormal(loc, cov_factor, cov_diag)``
and falls back to an independent normal when the covariance is numerically
invalid. Here the distribution is three arrays (mean (B,N), diag (B,N),
factor (B,N,R)) produced by the model, and sampling / log-density are pure
functions:

- ``sample``: mean + factor @ eps_R + sqrt(diag) * eps_N — the same
  reparameterization torch uses; vmapping over keys replaces
  ``distribution.sample([n_pred])`` (``test_2D.py:1171``).
- validity: torch raises on a failed Cholesky of the capacitance matrix; we
  compute the capacitance Cholesky and flag NaN/non-finite per batch element,
  selecting the diag-only fallback with ``jnp.where`` (jit-safe).
- ``log_prob``: Woodbury/capacitance form, O(N R^2).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SSNDistribution(NamedTuple):
    mean: jnp.ndarray  # (B, N)
    cov_diag: jnp.ndarray  # (B, N) > 0
    cov_factor: jnp.ndarray  # (B, N, R)
    cov_failed: jnp.ndarray  # (B,) bool — fallback to diag-only


def build_distribution(
    mean: jnp.ndarray, cov_diag: jnp.ndarray, cov_factor: jnp.ndarray
) -> SSNDistribution:
    """Validate the low-rank covariance like torch does (capacitance Cholesky).

    A failed (non-finite) Cholesky or non-finite inputs flag ``cov_failed``
    and zero out the factor for that batch element.
    """
    cap = _capacitance(cov_diag, cov_factor)
    chol = jnp.linalg.cholesky(cap)
    finite_inputs = (
        jnp.all(jnp.isfinite(mean), axis=-1)
        & jnp.all(jnp.isfinite(cov_diag), axis=-1)
        & jnp.all(jnp.isfinite(cov_factor), axis=(-2, -1))
    )
    ok = jnp.all(jnp.isfinite(chol), axis=(-2, -1)) & finite_inputs
    failed = ~ok
    safe_factor = jnp.where(failed[:, None, None], 0.0, cov_factor)
    return SSNDistribution(mean, cov_diag, safe_factor, failed)


def sample(dist: SSNDistribution, rng: jax.Array, shape_hint=None) -> jnp.ndarray:
    """One draw from the distribution; (B, N). vmap over rngs for more."""
    b, n = dist.mean.shape
    r = dist.cov_factor.shape[-1]
    k1, k2 = jax.random.split(rng)
    eps_r = jax.random.normal(k1, (b, r), dist.mean.dtype)
    eps_n = jax.random.normal(k2, (b, n), dist.mean.dtype)
    low_rank = jnp.einsum("bnr,br->bn", dist.cov_factor, eps_r)
    return dist.mean + low_rank + jnp.sqrt(dist.cov_diag) * eps_n


def sample_n(dist: SSNDistribution, rng: jax.Array, num_samples: int) -> jnp.ndarray:
    """(S, B, N) stack of samples — replaces ``distribution.sample([S])``."""
    keys = jax.random.split(rng, num_samples)
    return jax.vmap(lambda k: sample(dist, k))(keys)


def _capacitance(cov_diag: jnp.ndarray, cov_factor: jnp.ndarray) -> jnp.ndarray:
    """I_R + W^T D^-1 W, per batch element."""
    r = cov_factor.shape[-1]
    wd = cov_factor / cov_diag[..., None]  # (B, N, R)
    cap = jnp.einsum("bnr,bns->brs", wd, cov_factor)
    return cap + jnp.eye(r, dtype=cov_factor.dtype)


def log_prob(dist: SSNDistribution, value: jnp.ndarray) -> jnp.ndarray:
    """Log density of (B, N) values; (B,). Uses the Woodbury identity."""
    delta = value - dist.mean
    d_inv_delta = delta / dist.cov_diag
    quad_diag = jnp.sum(delta * d_inv_delta, axis=-1)
    wt_d_delta = jnp.einsum("bnr,bn->br", dist.cov_factor, d_inv_delta)
    cap = _capacitance(dist.cov_diag, dist.cov_factor)
    chol = jnp.linalg.cholesky(cap)
    sol = jax.scipy.linalg.cho_solve((chol, True), wt_d_delta[..., None])[..., 0]
    quad = quad_diag - jnp.sum(wt_d_delta * sol, axis=-1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    ) + jnp.sum(jnp.log(dist.cov_diag), axis=-1)
    n = dist.mean.shape[-1]
    return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))
