"""Multi-rater 2D segmentation dataset over the reference's on-disk format.

File contract (``uncertainty_modeling/data/lidc2d_dataset.py:90-363``):

- ``{base_dir}/preprocessed/images/*.npy`` float32 or uint8 images;
  ``{base_dir}/preprocessed/labels/{base_id}_{rater:02d}_mask.npy`` per-rater
  masks; OOD shifts live under ``preprocessed/augmented/<shift>/images``.
- ``splits.pkl``: a list of fold dicts; each maps split names (``train``,
  ``val``, ``id``, ``ood_noise``, ``unlabeled``, paired ``id&ood_x``, ...) to
  lists of image paths relative to ``preprocessed/`` and may carry a
  ``_meta`` dict (schema, dataset_name, rater_pattern).
- grayscale images are replicated to 3 channels; uint8 scaled by 1/255.
- rater selection modes: all raters (eval), uniformly random (train), or a
  stable sha256 hash of ``"13:{dataset}:{split}:{image_id}"`` (train with
  ``single_rater=True`` — byte-identical to the reference's
  ``_stable_rater_index``).

This is a pure-numpy index + loader: batching/prefetch/device transfer live
in ``loader.py`` (the JAX equivalent of the torch DataLoader worker pool).
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Any

import numpy as np

_RATER_COUNTS = {"lidc": 4, "npc": 4, "chaksu": 5, "riga": 6, "refuge": 7, "toy": 4}


def infer_num_raters(dataset_name: str) -> int | None:
    """``lidc2d_dataset.py:11-28`` name-prefix lookup."""
    name = dataset_name.lower()
    for key, count in _RATER_COUNTS.items():
        if key in name:
            return count
    return None


def load_splits(splits_path: str | Path) -> list[dict]:
    with open(splits_path, "rb") as f:
        splits = pickle.load(f)
    if not isinstance(splits, (list, tuple)) or not splits:
        raise ValueError("Expected splits.pkl to contain a non-empty list of fold dicts")
    return list(splits)


def save_splits(splits: list[dict], splits_path: str | Path) -> None:
    Path(splits_path).parent.mkdir(parents=True, exist_ok=True)
    with open(splits_path, "wb") as f:
        pickle.dump(splits, f)


class MultiRaterDataset:
    """Index over one split of a multi-rater dataset."""

    def __init__(
        self,
        splits_path: str | Path,
        base_dir: str | Path,
        split: str = "train",
        data_fold_id: int = 0,
        num_raters: int | None = None,
        rater_pattern: str | None = None,
        return_all_raters: bool = True,
        single_rater: bool = False,
        replicate_channels: bool = True,
        dataset_label: str | None = None,
    ):
        self.split = split
        self.base_dir = Path(base_dir)
        self.return_all_raters = return_all_raters
        self.single_rater = bool(single_rater)
        self.replicate_channels = replicate_channels
        self._single_rater_seed = 13

        folds = load_splits(splits_path)
        if data_fold_id >= len(folds):
            raise ValueError(f"fold {data_fold_id} not in splits ({len(folds)} folds)")
        fold = folds[data_fold_id]
        meta = fold.get("_meta", {})
        self.split_schema = meta.get("schema")
        is_combined = "combined" in str(self.split_schema or "").lower()
        self.rater_pattern = (
            rater_pattern or meta.get("rater_pattern") or "{base_id}_{rater:02d}_mask.npy"
        )

        if split not in fold:
            available = sorted(k for k in fold if not k.startswith("_"))
            raise ValueError(f"Unknown split '{split}'. Available: {available}")
        subject_ids = list(np.asarray(fold[split]).tolist())

        self.image_paths: list[Path] = []
        self.label_paths: list[list[Path]] = []
        self.image_ids: list[str] = []
        self.sample_datasets: list[str] = []

        if is_combined:
            # combined schema (``lidc2d_dataset.py:197-235``): subject ids are
            # "<dataset>/<rel path>" under the parent dir; per-dataset rater
            # counts come from _meta.dataset_configs
            self.dataset_label = str(dataset_label or meta.get("dataset_name") or "combined")
            configs = meta.get("dataset_configs", {})
            if not configs:
                raise ValueError("combined split needs _meta.dataset_configs")
            parent_dir = self.base_dir.parent
            self.sample_num_raters: list[int] = []
            counts = []
            for rel in subject_ids:
                ds_name, sub_rel = str(rel).split("/", 1)
                n_r = int(configs[ds_name].get("num_raters"))
                proc = parent_dir / ds_name / "preprocessed"
                base_id = Path(sub_rel).stem
                self.image_paths.append(proc / sub_rel)
                self.label_paths.append([
                    proc / "labels" / self.rater_pattern.format(base_id=base_id, rater=r)
                    for r in range(n_r)
                ])
                self.image_ids.append(base_id)
                self.sample_datasets.append(ds_name)
                self.sample_num_raters.append(n_r)
                counts.append(n_r)
            self.num_raters = max(counts) if counts else (num_raters or 0)
        else:
            self.dataset_label = str(
                dataset_label or meta.get("dataset_name") or self.base_dir.name
            )
            self.num_raters = (
                num_raters
                or meta.get("num_raters")
                or infer_num_raters(self.dataset_label)
            )
            if self.num_raters is None:
                raise ValueError(
                    f"Cannot infer rater count for dataset '{self.dataset_label}'"
                )
            proc_dir = self.base_dir / "preprocessed"
            label_dir = proc_dir / "labels"
            for rel in subject_ids:
                base_id = Path(rel).stem
                self.image_paths.append(proc_dir / rel)
                self.label_paths.append([
                    label_dir / self.rater_pattern.format(base_id=base_id, rater=r)
                    for r in range(self.num_raters)
                ])
                self.image_ids.append(base_id)
                self.sample_datasets.append(self.dataset_label)

    def __len__(self) -> int:
        return len(self.image_paths)

    # ---- rater selection -------------------------------------------------

    def stable_rater_index(self, image_id: str, num_raters: int | None = None) -> int:
        seed_key = f"{self._single_rater_seed}:{self.dataset_label}:{self.split}:{image_id}"
        digest = hashlib.sha256(seed_key.encode("utf-8")).digest()
        value = int.from_bytes(digest[:4], byteorder="big", signed=False)
        return value % (num_raters or self.num_raters)

    # ---- loading ---------------------------------------------------------

    def _load_image(self, path: Path) -> np.ndarray:
        img = np.load(path)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        else:
            img = img.astype(np.float32)
        if img.ndim == 2:
            img = (
                np.repeat(img[..., None], 3, axis=2)
                if self.replicate_channels
                else img[..., None]
            )
        return img

    def load(self, idx: int, rng: np.random.Generator | None = None) -> dict[str, Any]:
        """Load one sample.

        Returns image (H, W, C) float32 and either all rater masks
        (R, H, W) int32 or a single selected mask (H, W) int32.
        """
        image = self._load_image(self.image_paths[idx])
        paths = self.label_paths[idx]
        if self.return_all_raters:
            masks = np.stack([np.load(p) for p in paths]).astype(np.int32)
        elif self.single_rater:
            ridx = self.stable_rater_index(self.image_ids[idx], len(paths))
            masks = np.load(paths[ridx]).astype(np.int32)
        else:
            if rng is None:
                rng = np.random.default_rng()
            masks = np.load(paths[int(rng.integers(len(paths)))]).astype(np.int32)
        return {
            "image": image,
            "seg": masks,
            "image_id": self.image_ids[idx],
            "dataset": self.sample_datasets[idx],
        }
