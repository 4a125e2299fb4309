"""Shared uncertainty-quality evaluation on the deterministic toy-128 set.

The protocol behind every ``quality`` block in the benchmark output and in
``assets/ensemble16_quality.json``: run a sampler over the toy-128 ``id``
test split and report Dice / BMA-GED / AURC / ECE — the reference's
"uncertainty quality" axes (failure detection + calibration,
``/root/reference/evaluation/README.md:28-36``) next to segmentation quality.

Used by ``bench.py`` (live, at bench time) and by
``tools/train_bench_assets.py`` (at asset-training time, as the recorded
quality for families whose full weights are too large to commit).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def toy128_quality_eval(
    built,
    sampler,
    params,
    data_cfg,
    *,
    batch: int = 16,
    hw: int = 128,
    seed_base: int = 777,
    log=None,
    tag: str = "",
):
    """Dice/GED/AURC/ECE of ``sampler(params, ·)`` on the toy-128 id split.

    ``data_cfg``: the model's data config — its augmentation mean/std are the
    normalization source of truth (the inference runner and the asset
    trainer both use them; hardcoding them here once mis-measured quality).
    """
    from ..data.augment import TrainAugmentConfig, normalize_batch
    from ..data.dataset import MultiRaterDataset
    from ..data.loader import BatchLoader
    from ..data.toy import generate_toy_dataset
    from ..evaln.tasks import calc_ece
    from ..infer.batch_metrics import make_batch_metrics
    from ..metrics.aurc import aurc
    from ..ops.entropy import uncertainty_heatmaps

    # dir keyed by size: a 32px smoke and the 128px bench must never share a
    # tree (generate_toy_dataset is also manifest-guarded against overwrite).
    # num_test=256 (was 32): the exact-vs-fast AURC/ECE deltas in PARITY.md §3
    # are stable at the quoted precision only with the larger split. The rng
    # draws train/val cases BEFORE test cases, so existing trained assets
    # (incl. the cached ensemble members) see identical train data.
    toy = generate_toy_dataset(
        Path(f"/tmp/bench_toy{hw}"), num_train=128, num_val=16, num_test=256,
        num_ood=16, num_raters=4, size=hw, seed=1234,
    )
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    ds = MultiRaterDataset(splits, toy, split="id", num_raters=4)
    loader = BatchLoader(ds, batch, drop_last=True)
    bm = make_batch_metrics(num_classes=built.num_classes, ignore_index=None,
                            meta=sampler.meta, compute_likelihood=False)
    jsampler = jax.jit(sampler)
    aug = data_cfg.augmentations
    aug_cfg = TrainAugmentConfig(mean=tuple(aug.mean), std=tuple(aug.std))

    dices, geds, tu_means, eces = [], [], [], []
    for bi, b in enumerate(loader):
        images = normalize_batch(jnp.asarray(b["image"]), aug_cfg)
        gt = jnp.asarray(b["seg"])
        stack = jsampler(params, images, jax.random.key(seed_base + bi))
        out = bm(stack, gt)
        dices.extend(np.asarray(out["dice"]).tolist())
        geds.extend(np.asarray(out["ged_bma"]).tolist())
        maps = uncertainty_heatmaps(
            stack.group_means.astype(jnp.float32), sample_axis=0, class_axis=-1)
        tu_means.extend(np.asarray(jnp.mean(maps["TU"], axis=(1, 2))).tolist())
        mean = np.asarray(stack.mean.astype(jnp.float32))
        pred = mean.argmax(-1)
        # pixel correctness vs the rater majority, confidence = max prob
        gt_np = np.asarray(gt)
        majority = (gt_np.mean(axis=1) >= 0.5).astype(np.int64)
        correct = (pred == majority).reshape(-1)
        confids = mean.max(-1).reshape(-1)
        eces.append(calc_ece(correct, confids))
    risks = 1.0 - np.asarray(dices)
    q = {
        "dice": round(float(np.mean(dices)), 4),
        "ged_bma": round(float(np.mean(geds)), 4),
        "aurc": round(float(aurc(risks, -np.asarray(tu_means))), 5),
        "ece": round(float(np.mean(eces)), 5),
    }
    if log is not None:
        log(f"quality[{tag}]: {q}")
    return q
