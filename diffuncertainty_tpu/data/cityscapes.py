"""GTA5 -> Cityscapes street-scene dataset.

Reference: ``uncertainty_modeling/data/cityscapes_dataset.py`` — npy images
with ONE annotation mask each; aleatoric GT ambiguity is synthesized by
``StochasticLabelSwitches`` (per-class Bernoulli swaps to the ``*_2``
alternates). The dataset exposes the same interface as ``MultiRaterDataset``:
in all-raters mode it returns ``n_reference_samples`` switched variants
(stable per-image rng, so "raters" are reproducible); in train mode a single
freshly-switched mask.

Preprocessing of the raw GTA/Cityscapes frames to common-size npy pairs is
``preprocess_gta_cityscapes`` below (the reference's
``datasets/gta_cityscapes/preprocess_gta_cityscapes*.py``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from . import cityscapes_labels as cs
from .augment_extra import stochastic_label_switches
from .dataset import MultiRaterDataset


class CityscapesDataset(MultiRaterDataset):
    """Single-mask dataset with label-switch reference sampling."""

    def __init__(
        self,
        splits_path,
        base_dir,
        split: str = "train",
        data_fold_id: int = 0,
        return_all_raters: bool = True,
        n_reference_samples: int = 4,
        switch_probs: dict | None = None,
        seed: int = 13,
        **kw,
    ):
        super().__init__(
            splits_path, base_dir, split=split, data_fold_id=data_fold_id,
            num_raters=1, rater_pattern="{base_id}_mask.npy",
            return_all_raters=False, single_rater=False,
            dataset_label=kw.pop("dataset_label", "cityscapes"), **kw,
        )
        self.return_switched_references = return_all_raters
        self.n_reference_samples = n_reference_samples
        self.switch_probs = switch_probs or cs.LABEL_SWITCH_PROBS
        self._seed = seed

    def load(self, idx: int, rng: np.random.Generator | None = None) -> dict:
        sample = super().load(idx, rng)
        mask = sample["seg"]
        if self.return_switched_references:
            # stable per-image reference raters
            stable = np.random.default_rng((self._seed, idx))
            sample["seg"] = np.asarray(
                stochastic_label_switches(
                    mask, stable, self.n_reference_samples, self.switch_probs
                ),
                np.int32,
            )
        else:
            r = rng or np.random.default_rng()
            sample["seg"] = np.asarray(
                stochastic_label_switches(mask, r, 1, self.switch_probs), np.int32
            )
        return sample


def preprocess_gta_cityscapes(
    raw_dir: str | Path,
    out_dir: str | Path,
    *,
    size: tuple[int, int] = (256, 512),
    dataset_name: str = "gta",
) -> list[str]:
    """Downscale raw (image.npy, {id}_mask.npy) pairs to a common size.

    Nearest for masks, bilinear (via PIL) for images — the reference's
    ``preprocess_gta_cityscapes_small`` behavior.
    """
    from PIL import Image

    raw_dir, out_dir = Path(raw_dir), Path(out_dir)
    img_out = out_dir / "preprocessed" / "images"
    lbl_out = out_dir / "preprocessed" / "labels"
    img_out.mkdir(parents=True, exist_ok=True)
    lbl_out.mkdir(parents=True, exist_ok=True)
    rel_ids = []
    h, w = size
    for img_path in sorted(raw_dir.glob("*.npy")):
        if img_path.name.endswith("_mask.npy"):
            continue
        base = img_path.stem
        img = np.load(img_path)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        img_small = np.asarray(pil.resize((w, h), Image.BILINEAR)).astype(np.float32) / 255.0
        np.save(img_out / f"{base}.npy", img_small)
        mask = np.load(raw_dir / f"{base}_mask.npy")
        mask_small = np.asarray(
            Image.fromarray(mask.astype(np.int32), mode="I").resize((w, h), Image.NEAREST)
        )
        np.save(lbl_out / f"{base}_mask.npy", mask_small.astype(np.uint8))
        rel_ids.append(f"images/{base}.npy")
    return rel_ids
