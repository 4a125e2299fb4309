"""C2 uncertainty measures: per-pixel entropy decompositions.

Matches ``uncertainty_modeling/unc_mod_utils/test_utils.py:833-864``:

- TU (predictive entropy)  = H[ mean_p softmax ]
- AU (expected entropy)    = mean_p H[ softmax_p ]
- EU (mutual information)  = TU - AU

The reference loops over classes/predictions in Python and masks NaN of
``p*log(p)`` at p=0; here the whole decomposition is one fused elementwise
reduction (``xlogx`` with a where-guard), vectorized over every leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _xlogx(p: jnp.ndarray) -> jnp.ndarray:
    """p * log(p) with the p==0 limit taken as 0 (reference NaN-masking)."""
    safe = jnp.where(p > 0, p, 1.0)
    return jnp.where(p > 0, p * jnp.log(safe), 0.0)


def entropy(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Shannon entropy along ``axis`` (natural log)."""
    return -jnp.sum(_xlogx(probs), axis=axis)


def uncertainty_heatmaps(
    softmax_preds: jnp.ndarray,
    *,
    sample_axis: int = 0,
    class_axis: int = 1,
) -> dict[str, jnp.ndarray]:
    """TU/AU/EU heatmaps from a stack of softmax predictions.

    Args:
        softmax_preds: ``(P, C, *spatial)`` by default (reference layout); the
            sample and class axes are configurable so NHWC stacks
            ``(P, H, W, C)`` work with ``class_axis=-1``.

    Returns:
        dict with "TU", "AU", "EU" arrays of the remaining shape.
    """
    mean_softmax = jnp.mean(softmax_preds, axis=sample_axis)
    mean_class_axis = class_axis if class_axis < 0 else class_axis - (sample_axis < class_axis)
    tu = entropy(mean_softmax, axis=mean_class_axis)
    per_sample_entropy = entropy(softmax_preds, axis=class_axis)
    au = jnp.mean(per_sample_entropy, axis=sample_axis)
    return {"TU": tu, "AU": au, "EU": tu - au}


def one_minus_msr(softmax_pred: jnp.ndarray, class_axis: int = 0) -> jnp.ndarray:
    """Single-prediction fallback: 1 - max softmax response.

    Matches ``test_utils.py:calculate_one_minus_msr``.
    """
    return 1.0 - jnp.max(softmax_pred, axis=class_axis)
