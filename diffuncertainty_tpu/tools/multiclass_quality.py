"""Multi-class full-frame quality evaluation (trained weights, GTA-style).

Closes the loop the reference's GTA/Cityscapes pipeline runs
(``evaluation/utils/gta.py:15-45``, palette PNGs ``test_2D.py:807-847``,
multiclass GED ``test_2D.py:901-918``) on the synthetic street-scene toy
(``data/gta_toy.py``):

- MC-dropout member predictions through SLIDING-WINDOW full-frame inference
  (one jitted program: vmap over member dropout keys around the tiled
  predict+stitch, ``infer/sliding_window.py``);
- multi-class macro Dice of the member-mean argmax vs the switched
  reference raters;
- multiclass GED vs the switched references;
- NCC of the TU/AU heatmaps against the ANALYTIC label-switch variance map
  (``cityscapes_labels.gt_switch_uncertainty_map``);
- a palette-PNG write/readback through ``ResultsWriter`` (the Cityscapes
  save path, ``infer/results.py:93-96``).

Used by ``bench.py`` (``full_frame_multiclass`` family) with the trained
asset from ``tools/train_bench_assets.py --model multiclass``.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import cityscapes_labels as cs
from ..data.augment_extra import stochastic_label_switches
from ..data.cityscapes_labels import gt_switch_uncertainty_map
from ..data.gta_toy import generate_gta_toy
from ..infer.sliding_window import sliding_window_predict
from ..metrics.dice import dice_multiclass_macro
from ..metrics.ged import ged_multiclass


def member_sliding_window_fn(module, *, window: int, stride: int, members: int,
                             num_classes: int):
    """(params, images(B,H,W,3), rng) -> (M, B, H, W, C) stitched softmax."""

    def one_member(key, params, images):
        def apply_fn(tiles):
            logits = module.apply(params, tiles, rngs={"dropout": key}).logits
            return jax.nn.softmax(logits, axis=-1)

        return sliding_window_predict(
            apply_fn, images, window=window, stride=stride,
            out_channels=num_classes,
        )

    def fn(params, images, rng):
        keys = jax.random.split(rng, members)
        # members run as a sequential scan, not vmap: vmapping the tiled
        # predict+stitch multiplies the scatter-add stitch workspace by M
        # (measured 22 GB > HBM at M=8, 8 frames 256x512); each member's
        # program still sees the full tile stack, so MXU grids stay large
        return jax.lax.map(
            lambda k: one_member(k, params, images), keys, batch_size=1
        )

    return fn


def gta_toy_quality_eval(
    built,
    params,
    data_cfg,
    *,
    frames: int = 8,
    frame_size: tuple[int, int] = (256, 512),
    window: int = 128,
    stride: int = 64,
    members: int = 8,
    n_references: int = 4,
    data_dir: str = "/tmp/bench_gtatoy",
    seed: int = 1234,
    timing_reps: int = 3,
    log=None,
) -> dict:
    """Quality + throughput of trained multi-class sliding-window inference."""
    from ..data.augment import TrainAugmentConfig, normalize_batch
    from ..data.dataset import MultiRaterDataset
    from ..evaln.tasks import compute_ncc
    from ..infer.results import ResultsWriter

    def _log(msg):
        if log:
            log(f"multiclass: {msg}")

    toy = generate_gta_toy(
        Path(data_dir), num_train=48, num_val=8, num_test=frames,
        train_size=(window, window), test_size=frame_size, seed=seed,
    )
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    ds = MultiRaterDataset(splits, toy, split="id")
    n_classes = built.num_classes

    aug = data_cfg.augmentations
    aug_cfg = TrainAugmentConfig(mean=tuple(aug.mean), std=tuple(aug.std))
    fn = member_sliding_window_fn(
        built.module, window=window, stride=stride, members=members,
        num_classes=n_classes,
    )
    jfn = jax.jit(fn)

    images = np.stack([ds.load(i)["image"] for i in range(len(ds))])
    masks = np.stack([np.load(ds.label_paths[i][0]) for i in range(len(ds))])
    x = normalize_batch(jnp.asarray(images), aug_cfg)

    stack = jax.device_get(jfn(params, x, jax.random.key(seed)))  # (M,B,H,W,C)
    # timing: whole-frame member-ensemble program, post-compile
    t0 = time.perf_counter()
    for i in range(timing_reps):
        jax.block_until_ready(jfn(params, x, jax.random.key(i)))
    frame_per_sec = frames * timing_reps / (time.perf_counter() - t0)

    mean_probs = stack.mean(axis=0)  # (B,H,W,C)
    pred_idx = np.argmax(mean_probs, axis=-1)

    # C2 heatmaps over the member axis
    eps = 1e-12
    tu = -np.sum(mean_probs * np.log(mean_probs + eps), axis=-1)
    au = -np.mean(np.sum(stack * np.log(stack + eps), axis=-1), axis=0)

    dices, geds, ncc_tu, ncc_au = [], [], [], []
    rng = np.random.default_rng(seed)
    for b in range(frames):
        refs = stochastic_label_switches(
            masks[b], rng, n_references, cs.GT_SWITCH_PROBS
        ).astype(np.int32)
        dices.append(float(np.mean([
            float(dice_multiclass_macro(
                jnp.asarray(pred_idx[b]), jnp.asarray(r), n_classes,
                ignore_index=None, include_background=True,
            ))
            for r in refs
        ])))
        member_idx = np.argmax(stack[:, b], axis=-1)  # (M,H,W)
        probs_m = jax.nn.one_hot(jnp.asarray(member_idx), n_classes)
        geds.append(float(ged_multiclass(
            probs_m, jnp.asarray(refs), n_classes, ignore_index=None,
        )["ged"]))
        analytic = gt_switch_uncertainty_map(masks[b])
        ncc_tu.append(compute_ncc(analytic, tu[b]))
        ncc_au.append(compute_ncc(analytic, au[b]))

    # palette-PNG path: write the mean prediction, read it back losslessly
    out_dir = Path(data_dir) / "palette_check"
    with ResultsWriter(out_dir, binary=False, palette=cs.palette()) as writer:
        writer.save_prediction("frame0", pred_idx[:1], pred_idx[0])
    from PIL import Image

    readback = np.asarray(Image.open(out_dir / "pred_seg" / "frame0_01.png"))
    palette_roundtrip = bool(np.array_equal(readback, pred_idx[0].astype(np.uint8)))

    result = {
        "dice_macro": round(float(np.mean(dices)), 4),
        "ged_multiclass": round(float(np.mean(geds)), 4),
        "ncc_tu_vs_analytic": round(float(np.mean(ncc_tu)), 4),
        "ncc_au_vs_analytic": round(float(np.mean(ncc_au)), 4),
        "palette_png_roundtrip": palette_roundtrip,
        "frames_per_sec": round(frame_per_sec, 2),
        "frame_size": list(frame_size),
        "window": window,
        "stride": stride,
        "members": members,
        "n_references": n_references,
    }
    _log(str(result))
    return result
