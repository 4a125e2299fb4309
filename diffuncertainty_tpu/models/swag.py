"""SWA-Gaussian posterior over parameter pytrees, fully on-device.

Reference: ``unc_mod_utils/swag.py`` keeps running first/second moments plus a
FIFO of deviation rows per parameter tensor, and samples weight sets with a
*shared* low-rank noise vector across all parameters (``swag.py:147-160``) so
cross-parameter correlations survive.

TPU-native redesign:

- State is a pytree triple (mean, sq_mean, dev) mirroring the param tree;
  ``dev`` leaves are fixed-shape ``(max_K, *param.shape)`` ring buffers with a
  global snapshot counter — no dynamic shapes, so collection jits once.
- ``sample`` is a pure function of (state, rng); the shared rank noise is one
  (max_K,) vector masked to the valid rows. ``jax.vmap(sample, rngs)`` draws a
  whole member stack at once — replacing the reference's sequential
  model-hopping loop (``test_2D.py:678-709``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SwagState(NamedTuple):
    n_models: jnp.ndarray  # () int32 — snapshots collected so far
    mean: Any  # pytree like params
    sq_mean: Any  # pytree like params
    dev: Any | None  # pytree of (max_K, *shape) deviation rings; None if diag_only


def init(params: Any, max_num_models: int = 20, diag_only: bool = False) -> SwagState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    dev = (
        None
        if diag_only
        else jax.tree.map(
            lambda p: jnp.zeros((max_num_models,) + p.shape, p.dtype), params
        )
    )
    return SwagState(jnp.zeros((), jnp.int32), zeros, jax.tree.map(jnp.zeros_like, params), dev)


def collect(state: SwagState, params: Any, max_num_models: int) -> SwagState:
    """Fold one snapshot into the running stats (``swag.py:165-196``)."""
    n = state.n_models.astype(jnp.float32)
    inv = 1.0 / (n + 1.0)
    coeff = n * inv
    new_mean = jax.tree.map(lambda m, p: m * coeff + p * inv, state.mean, params)
    new_sq = jax.tree.map(lambda s, p: s * coeff + p * p * inv, state.sq_mean, params)
    if state.dev is None:
        new_dev = None
    else:
        # ring-buffer write at slot n % K: matches FIFO since sampling is
        # order-invariant over rows
        slot = jnp.mod(state.n_models, max_num_models)

        def write(dev_leaf, p, m):
            row = (p - m)[None]
            return jax.lax.dynamic_update_slice_in_dim(dev_leaf, row, slot, axis=0)

        new_dev = jax.tree.map(write, state.dev, params, new_mean)
    return SwagState(state.n_models + 1, new_mean, new_sq, new_dev)


def sample(
    state: SwagState,
    rng: jax.Array,
    *,
    max_num_models: int,
    scale: float = 1.0,
    use_low_rank: bool = True,
    blockwise: bool = False,
    var_clamp: float = 1e-30,
) -> Any:
    """Draw one weight pytree from the SWAG posterior.

    Matches ``swag.py:91-163``: fullrank multiplies the whole perturbation by
    ``sqrt(scale)``; blockwise multiplies the diag term by ``scale`` and the
    low-rank term by ``scale / sqrt(K-1)``; the low-rank normalizer always
    uses the configured ``max_num_models``, not the collected count.
    """
    if use_low_rank and state.dev is None:
        raise ValueError("Low-rank sampling requested but state is diag_only")

    leaves, treedef = jax.tree.flatten(state.mean)
    sq_leaves = treedef.flatten_up_to(state.sq_mean)
    n_leaves = len(leaves)
    k_diag, k_rank = jax.random.split(rng)
    diag_keys = jax.random.split(k_diag, n_leaves)

    # low-rank noise masked to collected rows (order-invariant ring).
    # fullrank: ONE z shared across all leaves (cross-parameter correlations,
    # swag.py:147-160); blockwise: fresh z per leaf (swag.py:122-129).
    if use_low_rank:
        row_ids = jnp.arange(max_num_models)
        valid = row_ids < jnp.minimum(state.n_models, max_num_models)
        if blockwise:
            z_keys = jax.random.split(k_rank, n_leaves)
            z_per_leaf = [
                jnp.where(valid, jax.random.normal(k, (max_num_models,)), 0.0)
                for k in z_keys
            ]
        else:
            z_shared = jnp.where(valid, jax.random.normal(k_rank, (max_num_models,)), 0.0)
            z_per_leaf = [z_shared] * n_leaves
        normalizer = float(max(max_num_models - 1, 1)) ** 0.5
        dev_leaves = treedef.flatten_up_to(state.dev)
    else:
        z_per_leaf = [None] * n_leaves
        dev_leaves = [None] * n_leaves

    out_leaves = []
    scale_sqrt = float(scale) ** 0.5
    for i, (mean, sq_mean, dev) in enumerate(zip(leaves, sq_leaves, dev_leaves)):
        var = jnp.maximum(sq_mean - mean**2, var_clamp)
        eps = jax.random.normal(diag_keys[i], mean.shape, mean.dtype)
        diag_term = jnp.sqrt(var) * eps
        if use_low_rank:
            cov_term = jnp.tensordot(z_per_leaf[i], dev, axes=(0, 0)) / normalizer
        else:
            cov_term = 0.0
        if blockwise:
            w = mean + float(scale) * diag_term + (
                cov_term * float(scale) if use_low_rank else 0.0
            )
        else:
            w = mean + scale_sqrt * (diag_term + cov_term)
        out_leaves.append(w)
    return jax.tree.unflatten(treedef, out_leaves)


def sample_members(
    state: SwagState, rng: jax.Array, num_members: int, **kw
) -> Any:
    """Stacked parameter pytree with a leading member axis (M, ...).

    Feed to ``vmap(model.apply)`` for a whole-ensemble forward in one program.
    """
    keys = jax.random.split(rng, num_members)
    return jax.vmap(lambda k: sample(state, k, **kw))(keys)
