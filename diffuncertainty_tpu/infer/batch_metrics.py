"""Fused per-batch inference metrics: dice, GED, C2 heatmaps, NLL.

One jitted function computes everything the reference's ``process_output``
(``test_2D.py:955-1120``) derives per image with Python loops — vmapped over
the batch, on device, in the same program invocation as the sampler when the
caller composes them.

Axis conventions follow the reference:
- ``group_means`` (the reference's ``softmax_pred``) is the P-axis for the
  C2 measures and BMA-GED;
- grouped GED averages a per-group GED over groups;
- dice compares the argmax of the overall mean against every rater;
- NLL: per (rater, group) mean negative log prob over valid pixels
  (``:1043-1120``); ``gen_NLL`` pools samples of generative groups.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.dice import dice_bin_masked, dice_multiclass_macro
from ..metrics.ged import ged_binary, ged_multiclass
from ..ops.entropy import one_minus_msr, uncertainty_heatmaps
from ..sampling.sampler import PredictionStack, SamplerMeta


def make_batch_metrics(
    *,
    num_classes: int,
    ignore_index: int | None,
    meta: SamplerMeta,
    compute_dice: bool = True,
    compute_ged: bool = True,
    compute_ged_bma: bool = True,
    compute_likelihood: bool = True,
    eps: float = 1e-12,
) -> Callable:
    """Build ``fn(stack, gt) -> dict`` with gt (B, R, H, W) int labels."""

    binary = num_classes == 2
    gen_mask = tuple(meta.group_is_generative)
    any_gen = any(gen_mask)

    def per_image(group_probs, group_means, mean_probs, gt, n_raters):
        """group_probs (G,S,H,W,C), group_means (G,H,W,C), mean (H,W,C),
        gt (R,H,W), n_raters scalar (true rater count; padded raters beyond
        it are excluded from dice/NLL means) -> dict of scalars + heatmaps."""
        out: dict = {}
        mean_idx = jnp.argmax(mean_probs, axis=-1)
        group_idx = jnp.argmax(group_means, axis=-1)  # (G,H,W)
        out["mean_idx"] = mean_idx
        out["group_idx"] = group_idx
        rater_w = (jnp.arange(gt.shape[0]) < n_raters).astype(jnp.float32)  # (R,)
        rater_n = jnp.maximum(jnp.sum(rater_w), 1.0)

        if compute_dice:
            if binary:
                d = dice_bin_masked(mean_idx[None], gt, ignore_index)  # (R,)
            else:
                d = jax.vmap(
                    lambda rater: dice_multiclass_macro(
                        mean_idx, rater, num_classes, ignore_index=ignore_index
                    )
                )(gt)
            out["dice"] = jnp.sum(d * rater_w) / rater_n

        ged_ign = ignore_index if (ignore_index is not None and ignore_index >= 0) else None
        if compute_ged_bma:
            if binary:
                bma = ged_binary(group_means, gt, ignore_index=ged_ign, n_raters=n_raters)
            else:
                bma = ged_multiclass(group_means, gt, num_classes, ged_ign, n_raters=n_raters)
            out["ged_bma"] = bma["ged"]
            out["max_dice_pred"] = bma["max_dice_pred"]
            out["max_dice_gt"] = bma["max_dice_gt"]
            out["major_dice"] = bma["major_dice"]
        if compute_ged:
            def one_group(g_probs):
                if binary:
                    return ged_binary(g_probs, gt, ignore_index=ged_ign, n_raters=n_raters)["ged"]
                return ged_multiclass(g_probs, gt, num_classes, ged_ign, n_raters=n_raters)["ged"]

            out["ged"] = jnp.mean(jax.vmap(one_group)(group_probs))

        # ---- C2 heatmaps over the group-mean stack ----
        if group_means.shape[0] > 1:
            out["heatmaps"] = uncertainty_heatmaps(
                group_means, sample_axis=0, class_axis=-1
            )
        else:
            out["heatmaps"] = {"pred_entropy": one_minus_msr(group_means[0], class_axis=-1)}

        # ---- NLL ----
        if compute_likelihood:
            if ignore_index is not None and ignore_index >= 0:
                valid = gt != ignore_index  # (R,H,W)
            else:
                valid = jnp.ones_like(gt, dtype=jnp.bool_)
            vcount = jnp.sum(valid, axis=(1, 2)).astype(jnp.float32)  # (R,)
            safe_gt = jnp.clip(gt, 0, num_classes - 1)

            def nll_of(probs_stack):  # (K,H,W,C) -> (R,K)
                logp = jnp.log(jnp.clip(probs_stack, eps))
                picked = jnp.take_along_axis(
                    logp[None], safe_gt[:, None, :, :, None], axis=-1
                )[..., 0]  # (R,K,H,W)
                masked = picked * valid[:, None]
                return -(jnp.sum(masked, axis=(2, 3)) / jnp.maximum(vcount[:, None], 1.0))

            nll_rg = nll_of(group_means)  # (R, G)
            nll_rg = jnp.where(vcount[:, None] > 0, nll_rg, 0.0)
            nll_rg = nll_rg * rater_w[:, None]
            out["gt_model_NLL"] = nll_rg
            out["gt_NLL"] = jnp.mean(nll_rg, axis=1)
            out["mean_NLL"] = jnp.sum(nll_rg) / (rater_n * nll_rg.shape[1])
            if any_gen:
                gen_idx = np.nonzero(np.asarray(gen_mask))[0]
                gen_groups = group_probs[gen_idx]
                samples = gen_groups.reshape(-1, *gen_groups.shape[2:])
                nll_rs = nll_of(samples)
                nll_rs = jnp.where(vcount[:, None] > 0, nll_rs, 0.0)
                nll_rs = nll_rs * rater_w[:, None]
                out["gen_NLL"] = jnp.sum(nll_rs) / (rater_n * nll_rs.shape[1])
        return out

    def fn(stack: PredictionStack, gt: jnp.ndarray, num_raters=None) -> dict:
        # (G,S,B,...) -> batch-major for vmap
        gp = jnp.moveaxis(stack.groups, 2, 0)  # (B,G,S,H,W,C)
        gm = jnp.moveaxis(stack.group_means, 1, 0)  # (B,G,H,W,C)
        if num_raters is None:
            num_raters = jnp.full((gt.shape[0],), gt.shape[1], jnp.int32)
        # dice/NLL means and all GED terms mask collate-padded raters via
        # num_raters (combined_* variable-rater schemas; metrics/ged.py)
        return jax.vmap(per_image)(gp, gm, stack.mean, gt, num_raters)

    return jax.jit(fn)
