"""Results-on-disk writer matching the reference directory contract.

Layout (``test_2D.py:729-750``, ``uncertainty_modeling/README.md:84-99``):

    {save_dir}/{exp_name}/test_results{n_pred}/{version}/e{epoch}[_ema]/{split}/
        pred_seg/{image_id}_mean.png, {image_id}_01.png, ...
        TU/{image_id}.tif  AU/... EU/...   (float32 TIFF heatmaps)
        metrics.json       {id: {dataset, metrics: {dice, ged, ged_bma, ...}}}
        likelihood.json    {id: {dataset, gt_model_NLL, gt_NLL, mean_NLL, gen_NLL}}

PNGs: binary datasets store (mask>0)*255 with ignored pixels zeroed; heatmaps
are float32 single-channel TIFFs written with PIL (mode "F") — readable by
the reference's evaluation loaders.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image


class ResultsWriter:
    def __init__(self, split_dir: str | Path, *, binary: bool = True, palette=None):
        self.split_dir = Path(split_dir)
        self.pred_dir = self.split_dir / "pred_seg"
        self.pred_dir.mkdir(parents=True, exist_ok=True)
        self.binary = binary
        self.palette = palette
        self.metrics: dict[str, dict] = {}
        self.likelihood: dict[str, dict] = {}

    # ---- predictions -----------------------------------------------------

    def save_prediction(
        self,
        image_id: str,
        group_pred_idx: np.ndarray,  # (G, H, W) int argmax per group
        mean_pred_idx: np.ndarray,  # (H, W)
        ignore_mask: np.ndarray | None = None,
    ) -> None:
        multiple = group_pred_idx.shape[0] > 1
        entries = []
        if multiple:
            entries.append((f"{image_id}_mean", mean_pred_idx))
            entries.extend(
                (f"{image_id}_{i + 1:02d}", group_pred_idx[i])
                for i in range(group_pred_idx.shape[0])
            )
        else:
            entries.append((f"{image_id}_01", group_pred_idx[0]))
        for name, mask in entries:
            mask = np.asarray(mask).copy()
            if ignore_mask is not None:
                mask[np.asarray(ignore_mask, bool)] = 0
            if self.binary:
                img = ((mask > 0).astype(np.uint8)) * 255
                Image.fromarray(img, mode="L").save(self.pred_dir / f"{name}.png")
            else:
                img = Image.fromarray(mask.astype(np.uint8), mode="P")
                if self.palette is not None:
                    img.putpalette(self.palette)
                img.save(self.pred_dir / f"{name}.png")

    def save_uncertainty(self, image_id: str, heatmaps: dict[str, np.ndarray]) -> None:
        for unc_type, unc_map in heatmaps.items():
            unc_dir = self.split_dir / unc_type
            unc_dir.mkdir(parents=True, exist_ok=True)
            arr = np.asarray(unc_map, np.float32)
            Image.fromarray(arr, mode="F").save(unc_dir / f"{image_id}.tif")

    # ---- scalar records --------------------------------------------------

    def add_metrics(self, image_id: str, dataset: str, metrics: dict) -> None:
        self.metrics[image_id] = {"dataset": dataset, "metrics": metrics}

    def add_likelihood(self, image_id: str, dataset: str, record: dict) -> None:
        self.likelihood[image_id] = {"dataset": dataset, **record}

    def flush(self) -> None:
        with open(self.split_dir / "metrics.json", "w") as f:
            json.dump(self.metrics, f, indent=2)
        if self.likelihood:
            with open(self.split_dir / "likelihood.json", "w") as f:
                json.dump(self.likelihood, f, indent=2)


def result_split_dir(
    save_dir: str | Path,
    exp_name: str,
    n_pred: int,
    version: str,
    epoch: int,
    ema: bool,
    split: str,
) -> Path:
    tag = f"e{epoch}_ema" if ema else f"e{epoch}"
    return Path(save_dir) / exp_name / f"test_results{n_pred}" / version / tag / split
