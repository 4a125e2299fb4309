"""Dice scores with the reference's edge-case conventions, fully vectorized.

Provenance:
- binary Dice: ``evaluation/metrics/dice_wrapped.py:4-15`` — both masks empty
  => 1.0, exactly one empty => 0.0, else 2TP/(2TP+FP+FN); no ignore handling.
- multiclass Dice: ``dice_wrapped.py:17-87`` — label values shifted +1 so
  ignored pixels can occupy a dropped background channel; with
  ``include_background=True`` and micro/global averaging this reduces to
  pixel accuracy over non-ignored pixels (every valid pixel contributes one
  TP or one FP+FN). All-ignored image => 1.0.
- soft Dice loss: ``uncertainty_modeling/loss_modules.py:7-94``.

All functions are jnp and jittable with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_bin(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Binary Dice over the trailing axes; leading axes are batched.

    ``pred``/``gt`` are {0,1} arrays of shape (..., H, W); returns (...).
    """
    axes = (-2, -1)
    pred = pred.astype(jnp.bool_)
    gt = gt.astype(jnp.bool_)
    tp = jnp.sum(pred & gt, axis=axes).astype(jnp.float32)
    pred_sum = jnp.sum(pred, axis=axes).astype(jnp.float32)
    gt_sum = jnp.sum(gt, axis=axes).astype(jnp.float32)
    denom = pred_sum + gt_sum
    both_empty = (pred_sum == 0) & (gt_sum == 0)
    one_empty = (pred_sum == 0) ^ (gt_sum == 0)
    safe = jnp.where(denom > 0, denom, 1.0)
    regular = 2.0 * tp / safe
    return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, regular))


def dice_multiclass_micro(
    pred_idx: jnp.ndarray,
    target_idx: jnp.ndarray,
    num_classes: int,
    ignore_index: int | None = 255,
    include_background: bool = True,
) -> jnp.ndarray:
    """Micro-averaged global Dice on (..., H, W) index maps; returns (...).

    With ``include_background=True`` this equals accuracy over valid pixels
    (the reference's shifted-label torchmetrics path); with False, it is the
    foreground micro Dice over classes >= 1. All pixels ignored => 1.0; with
    background excluded, pred and target both entirely background => 1.0.
    """
    axes = (-2, -1)
    if ignore_index is None:
        valid = jnp.ones_like(target_idx, dtype=jnp.bool_)
    else:
        valid = target_idx != ignore_index
    n_valid = jnp.sum(valid, axis=axes).astype(jnp.float32)
    if include_background:
        correct = jnp.sum((pred_idx == target_idx) & valid, axis=axes).astype(jnp.float32)
        score = correct / jnp.where(n_valid > 0, n_valid, 1.0)
        return jnp.where(n_valid == 0, 1.0, score)
    pred_fg = (pred_idx >= 1) & valid
    tgt_fg = (target_idx >= 1) & valid
    tp = jnp.sum(pred_fg & tgt_fg & (pred_idx == target_idx), axis=axes).astype(jnp.float32)
    denom = (jnp.sum(pred_fg, axis=axes) + jnp.sum(tgt_fg, axis=axes)).astype(jnp.float32)
    score = 2.0 * tp / jnp.where(denom > 0, denom, 1.0)
    all_bg = denom == 0
    return jnp.where(n_valid == 0, 1.0, jnp.where(all_bg, 1.0, score))


def dice_bin_masked(
    pred: jnp.ndarray, gt: jnp.ndarray, ignore_index: int | None
) -> jnp.ndarray:
    """Binary Dice with per-rater valid masks — the reference's vectorized
    LIDC path (``test_2D.py:874-898``). pred (..., H, W) in {0,1}; gt may
    contain ``ignore_index``; returns (...)."""
    axes = (-2, -1)
    if ignore_index is None:
        valid = jnp.ones_like(gt, dtype=jnp.bool_)
    else:
        valid = gt != ignore_index
    pred_pos = (pred == 1) & valid
    gt_pos = (gt == 1) & valid
    tp = jnp.sum(pred_pos & gt_pos, axis=axes).astype(jnp.float32)
    pred_sum = jnp.sum(pred_pos, axis=axes).astype(jnp.float32)
    gt_sum = jnp.sum(gt_pos, axis=axes).astype(jnp.float32)
    denom = 2 * tp + (pred_sum - tp) + (gt_sum - tp)
    both_empty = (pred_sum == 0) & (gt_sum == 0)
    one_empty = (pred_sum == 0) ^ (gt_sum == 0)
    regular = 2.0 * tp / jnp.where(denom > 0, denom, 1.0)
    return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, regular))


def dice_multiclass_macro(
    pred_idx: jnp.ndarray,
    target_idx: jnp.ndarray,
    num_classes: int,
    ignore_index: int | None = None,
    include_background: bool = False,
) -> jnp.ndarray:
    """Macro-averaged Dice on (H, W) index maps (per-rater multiclass path,
    ``test_2D.py:901-918`` with ``average="macro"``).

    Per-class Dice 2TP/(P+T) over the included classes; classes with zero
    support in both pred and target are excluded from the mean; if no class
    has support the score is 1.0.
    """
    if ignore_index is None:
        valid = jnp.ones_like(target_idx, dtype=jnp.bool_)
    else:
        valid = target_idx != ignore_index
    start = 0 if include_background else 1
    classes = jnp.arange(start, num_classes)
    pred_c = (pred_idx[None] == classes[:, None, None]) & valid[None]
    tgt_c = (target_idx[None] == classes[:, None, None]) & valid[None]
    tp = jnp.sum(pred_c & tgt_c, axis=(1, 2)).astype(jnp.float32)
    denom = (jnp.sum(pred_c, axis=(1, 2)) + jnp.sum(tgt_c, axis=(1, 2))).astype(jnp.float32)
    present = denom > 0
    per_class = 2.0 * tp / jnp.where(present, denom, 1.0)
    n_present = jnp.sum(present)
    mean = jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.where(n_present > 0, n_present, 1)
    return jnp.where(n_present > 0, mean, 1.0)


def soft_dice_loss(
    probs: jnp.ndarray,
    target_idx: jnp.ndarray,
    *,
    do_bg: bool = True,
    smooth: float = 1e-5,
    smooth_in_nom: bool = True,
) -> jnp.ndarray:
    """Soft Dice loss on NHWC probabilities vs (B, H, W) integer targets.

    Returns the scalar mean of ``-(2*intersect + s_nom) / (denom + s)`` over
    batch and classes, matching ``loss_modules.py:soft_dice``.
    """
    num_classes = probs.shape[-1]
    onehot = jnp.eye(num_classes, dtype=probs.dtype)[
        jnp.clip(target_idx, 0, num_classes - 1)
    ]
    if not do_bg:
        probs = probs[..., 1:]
        onehot = onehot[..., 1:]
    axes = tuple(range(1, probs.ndim - 1))  # spatial
    intersect = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs + onehot, axis=axes)
    s_nom = smooth if smooth_in_nom else 0.0
    return jnp.mean(-((2.0 * intersect + s_nom) / (denom + smooth)))
