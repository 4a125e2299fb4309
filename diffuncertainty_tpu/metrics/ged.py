"""Generalized Energy Distance, fully vectorized on device.

GED = 2 E[d(p,g)] - E[d(p,p')] - E[d(g,g')] with d = 1 - Dice.

Provenance and conventions:
- binary: ``evaluation/metrics/ged_fast.py:5-142`` — Dice vs GT uses the per-
  GT ignore mask; pred-pred Dice uses a Gram matrix without masking (ones on
  empty-empty pairs); gt-gt respects the ignore mask of the *second* rater;
  empty-mask rules both-empty => 1, one-empty => 0 apply to pred-gt pairs.
- multiclass: ``unc_mod_utils/test_utils.py:739-830`` — pairwise micro dice
  (= accuracy over the target's valid pixels); pred-pred ignores nothing;
  major_dice uses the rater mode (ties -> smallest class, like torch.mode).

The reference computes the multiclass dice matrix with a Python double loop
of CPU calls; here each term is one einsum over one-hot encodings — shaped to
land on the MXU.

Padded raters: combined variable-rater datasets pad the rater axis with
all-zero masks at collate time (``data/lidc2d_dataset.py:31-86``). Both
functions take ``n_raters`` (true per-image rater count); raters at index
>= n_raters are excluded from every GT-involving term (pred-gt mean, gt-gt
mean, max-dice reductions, majority vote). ``n_raters=None`` keeps the full
axis (uniform-rater datasets, where padding never occurs).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_F32 = jnp.float32


def _rater_weights(n_gt: int, n_raters) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(w, sum_w): w (G,) float 1.0 for true raters, 0.0 for padding."""
    if n_raters is None:
        w = jnp.ones((n_gt,), _F32)
    else:
        w = (jnp.arange(n_gt) < n_raters).astype(_F32)
    return w, jnp.maximum(jnp.sum(w), 1.0)


def _dice_from_counts(tp, pred_sum, gt_sum):
    denom = pred_sum + gt_sum
    both_empty = (pred_sum == 0) & (gt_sum == 0)
    one_empty = (pred_sum == 0) ^ (gt_sum == 0)
    regular = 2.0 * tp / jnp.where(denom > 0, denom, 1.0)
    return jnp.where(both_empty, 1.0, jnp.where(one_empty, 0.0, regular))


def ged_binary(
    output_softmax: jnp.ndarray,
    ground_truth: jnp.ndarray,
    ignore_index: int | None = None,
    n_raters=None,
) -> dict[str, jnp.ndarray]:
    """Binary GED from a (P, H, W, 2) softmax stack and (G, H, W) rater labels.

    ``n_raters``: optional scalar true-rater count; raters beyond it are
    zero-padding from the combined-schema collate and are masked out.

    Returns dict with scalar jnp values: ged, dice, max_dice_pred,
    max_dice_gt, major_dice, and the (P, G) dice_matrix.
    """
    assert output_softmax.ndim == 4 and output_softmax.shape[-1] == 2
    p = output_softmax.shape[0]
    gt = ground_truth
    rw, rn = _rater_weights(gt.shape[0], n_raters)  # (G,), scalar
    pred_idx = jnp.argmax(output_softmax, axis=-1)  # (P, H, W)

    if ignore_index is None:
        gt_valid = jnp.ones_like(gt, dtype=jnp.bool_)
    else:
        gt_valid = gt != ignore_index

    # ---- pred-gt dice matrix (P, G) with per-GT valid mask ----
    pred_pos = (pred_idx[:, None] == 1) & gt_valid[None]  # (P,G,H,W)
    gt_pos = (gt[None] == 1) & gt_valid[None]
    tp = jnp.sum(pred_pos & gt_pos, axis=(2, 3)).astype(_F32)
    pred_sum = jnp.sum(pred_pos, axis=(2, 3)).astype(_F32)
    gt_sum = jnp.sum(gt_pos, axis=(2, 3)).astype(_F32)
    dice_pg = _dice_from_counts(tp, pred_sum, gt_sum)
    dist_gt_pred_2 = jnp.sum((1.0 - dice_pg) * rw[None]) / (p * rn)

    # ---- pred-pred via Gram matrix (no mask; empty pairs -> dice 1) ----
    f = (pred_idx == 1).reshape(p, -1).astype(_F32)
    tp_mat = f @ f.T
    pos = jnp.sum(f, axis=1)
    denom_pp = pos[:, None] + pos[None, :]
    dice_pp = jnp.where(denom_pp > 0, 2.0 * tp_mat / jnp.where(denom_pp > 0, denom_pp, 1.0), 1.0)
    dist_pred_pred_2 = jnp.mean(1.0 - dice_pp)

    # ---- gt-gt with the mask of rater j ----
    gt_bin = gt == 1  # (G,H,W)
    gtj = gt_bin[None] & gt_valid[:, None]  # (J, G, H, W): rater i under mask j
    gtj_self = gt_bin & gt_valid  # (G,H,W)
    tp_g = jnp.sum(gtj & gtj_self[:, None], axis=(2, 3)).astype(_F32)  # (J=G, G)
    gi_sum = jnp.sum(gtj, axis=(2, 3)).astype(_F32)
    gtj_sum = jnp.sum(gtj_self, axis=(1, 2)).astype(_F32)[:, None]
    denom_g = gi_sum + gtj_sum
    dice_g = jnp.where(denom_g > 0, 2.0 * tp_g / jnp.where(denom_g > 0, denom_g, 1.0), 1.0)
    dist_gt_gt_2 = jnp.sum((1.0 - dice_g) * rw[:, None] * rw[None, :]) / (rn * rn)

    ged = 2.0 * dist_gt_pred_2 - dist_pred_pred_2 - dist_gt_gt_2

    # ---- major dice ----
    majority_pred = jnp.argmax(jnp.mean(output_softmax, axis=0), axis=-1)
    pos_frac = jnp.sum((gt == 1).astype(_F32) * rw[:, None, None], axis=0) / rn
    majority_gt = (pos_frac >= 0.5).astype(jnp.int32)
    if ignore_index is not None:
        valid_all = jnp.all((gt != ignore_index) | (rw[:, None, None] == 0), axis=0)
    else:
        valid_all = jnp.ones_like(majority_gt, dtype=jnp.bool_)
    mp = (majority_pred == 1) & valid_all
    mg = (majority_gt == 1) & valid_all
    tp_m = jnp.sum(mp & mg).astype(_F32)
    ps_m = jnp.sum(mp).astype(_F32)
    gs_m = jnp.sum(mg).astype(_F32)
    major_dice = _dice_from_counts(tp_m, ps_m, gs_m)

    return {
        "ged": ged,
        "dice": jnp.sum(dice_pg * rw[None]) / (p * rn),
        "max_dice_pred": jnp.mean(jnp.max(jnp.where(rw[None] > 0, dice_pg, -jnp.inf), axis=1)),
        "max_dice_gt": jnp.sum(jnp.max(dice_pg, axis=0) * rw) / rn,
        "major_dice": major_dice,
        "dice_matrix": dice_pg,
    }


def ged_multiclass(
    output_softmax: jnp.ndarray,
    ground_truth: jnp.ndarray,
    num_classes: int,
    ignore_index: int | None = 0,
    n_raters=None,
) -> dict[str, jnp.ndarray]:
    """Multiclass GED from (P, H, W, C) softmax and (G, H, W) labels.

    Pairwise distance is 1 - micro Dice, which for full-class micro averaging
    equals accuracy over the target's valid pixels (see metrics/dice.py).
    ``n_raters`` masks collate-padded raters as in :func:`ged_binary`.
    """
    p = output_softmax.shape[0]
    g = ground_truth.shape[0]
    rw, rn = _rater_weights(g, n_raters)
    pred_idx = jnp.argmax(output_softmax, axis=-1)  # (P,H,W)
    gt = ground_truth

    if ignore_index is None:
        gt_valid = jnp.ones_like(gt, dtype=jnp.bool_)
    else:
        gt_valid = gt != ignore_index

    hw = pred_idx.shape[1] * pred_idx.shape[2]
    pred_flat = pred_idx.reshape(p, hw)
    gt_flat = gt.reshape(g, hw)
    valid_flat = gt_valid.reshape(g, hw).astype(_F32)

    # pred-gt accuracy under gt mask: agree[p,g] = sum_n [pred_p==gt_g]*valid_g
    agree = jnp.einsum(
        "pnc,gnc->pg",
        jax_one_hot(pred_flat, num_classes),
        jax_one_hot(gt_flat, num_classes) * valid_flat[..., None],
        precision=lax.Precision.HIGHEST,
    )
    n_valid = jnp.sum(valid_flat, axis=1)  # (G,)
    dice_pg = jnp.where(n_valid[None] > 0, agree / jnp.where(n_valid[None] > 0, n_valid[None], 1.0), 1.0)
    dist_gt_pred_2 = jnp.sum((1.0 - dice_pg) * rw[None]) / (p * rn)

    # pred-pred accuracy, no mask
    oh_pred = jax_one_hot(pred_flat, num_classes)
    agree_pp = jnp.einsum("pnc,qnc->pq", oh_pred, oh_pred, precision=lax.Precision.HIGHEST)
    dice_pp = agree_pp / hw
    dist_pred_pred_2 = jnp.where(p > 1, jnp.mean(1.0 - dice_pp), 0.0)

    # gt-gt accuracy under mask of rater j (the dice() target)
    oh_gt = jax_one_hot(gt_flat, num_classes)
    agree_gg = jnp.einsum(
        "inc,jnc->ij", oh_gt, oh_gt * valid_flat[..., None], precision=lax.Precision.HIGHEST
    )
    dice_gg = jnp.where(n_valid[None] > 0, agree_gg / jnp.where(n_valid[None] > 0, n_valid[None], 1.0), 1.0)
    dist_gt_gt_2 = jnp.where(
        g > 1, jnp.sum((1.0 - dice_gg) * rw[:, None] * rw[None, :]) / (rn * rn), 0.0
    )

    ged = 2.0 * dist_gt_pred_2 - dist_pred_pred_2 - dist_gt_gt_2

    # major dice: mode over raters (ties -> smallest class, like torch.mode);
    # the reference then calls dice(majority_pred, majority_gt, ignore_index)
    # which masks pixels where the MAJORITY label equals the ignore value
    # (test_utils.py:817-827 -> dice_wrapped ignore semantics)
    majority_pred = jnp.argmax(jnp.mean(output_softmax, axis=0), axis=-1)
    counts = jnp.sum(jax_one_hot(gt, num_classes) * rw[:, None, None, None], axis=0)  # (H,W,C)
    majority_gt = jnp.argmax(counts, axis=-1)
    if ignore_index is not None:
        valid_m = majority_gt != ignore_index
    else:
        valid_m = jnp.ones_like(majority_gt, jnp.bool_)
    agree_m = jnp.sum((majority_pred == majority_gt) & valid_m).astype(_F32)
    nv = jnp.sum(valid_m).astype(_F32)
    major_dice = jnp.where(nv > 0, agree_m / jnp.where(nv > 0, nv, 1.0), 1.0)

    return {
        "ged": ged,
        "dice": jnp.sum(dice_pg * rw[None]) / (p * rn),
        "max_dice_pred": jnp.mean(jnp.max(jnp.where(rw[None] > 0, dice_pg, -jnp.inf), axis=1)),
        "max_dice_gt": jnp.sum(jnp.max(dice_pg, axis=0) * rw) / rn,
        "major_dice": major_dice,
        "dice_matrix": dice_pg,
    }


def jax_one_hot(idx: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot with out-of-range indices (e.g. ignore labels) mapped to zeros."""
    idx_clip = jnp.clip(idx, 0, num_classes - 1)
    oh = jnp.eye(num_classes, dtype=_F32)[idx_clip]
    in_range = (idx >= 0) & (idx < num_classes)
    return oh * in_range[..., None].astype(_F32)
