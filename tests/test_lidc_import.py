"""Original-LIDC pickle importer: end-to-end into the MultiRaterDataset contract."""

import csv
import pickle

import numpy as np
import pytest

from diffuncertainty_tpu.data.dataset import MultiRaterDataset, load_splits
from diffuncertainty_tpu.data.lidc_import import (
    block_reduce_2d,
    build_cv_splits,
    main as lidc_main,
    patient_code,
)


def _write_fixture(tmp_path, n_patients=8, crops_per_patient=2, rng=None):
    rng = rng or np.random.default_rng(0)
    payload = {}
    rows = []
    k = 0
    for p in range(n_patients):
        subject = f"LIDC-IDRI-{p + 1:04d}"
        series = f"1.2.3.{p}"
        rows.append((subject, series))
        for _ in range(crops_per_patient):
            payload[f"entry{k}"] = {
                "series_uid": series,
                "image": rng.normal(size=(128, 128)).astype(np.float32),
                "masks": [
                    (rng.random((128, 128)) < 0.1).astype(np.uint8) for _ in range(4)
                ],
            }
            k += 1
    pkl = tmp_path / "data_lidc.pickle"
    with open(pkl, "wb") as fh:
        pickle.dump(payload, fh)
    meta = tmp_path / "LIDC-IDRI_MetaData.csv"
    with open(meta, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Subject ID", "Series ID"])
        w.writerows(rows)
    return pkl, meta


def test_block_reduce_and_patient_code():
    a = np.arange(16, dtype=np.float32).reshape(4, 4)
    m = block_reduce_2d(a, 2, "mean")
    np.testing.assert_allclose(m, [[2.5, 4.5], [10.5, 12.5]])
    x = block_reduce_2d(a, 2, "max")
    np.testing.assert_allclose(x, [[5, 7], [13, 15]])
    assert patient_code("LIDC-IDRI-0042") == "0042"
    with pytest.raises(ValueError):
        block_reduce_2d(a, 3, "mean")


def test_importer_cli_end_to_end(tmp_path):
    pkl, meta = _write_fixture(tmp_path)
    lidc_main([
        "--pickle-path", str(pkl), "--metadata-csv", str(meta),
        "--out-root", str(tmp_path), "--image-size", "64",
        "--num-splits", "3", "--test-ratio", "0.25", "--seed", "7",
    ])
    root = tmp_path / "origlidc64"
    folds = load_splits(root / "splits" / "ood_aug" / "firstCycle" / "splits.pkl")
    assert len(folds) == 3
    fold = folds[0]
    # 8 patients x 2 crops: 2 test patients (25%), pool of 6 across train+val
    assert len(fold["id"]) == 4 and len(fold["train"]) + len(fold["val"]) == 12
    # patient-disjoint: id/train/val patient codes don't overlap
    def codes(names):
        return {n.split("/")[-1].split("_")[0] for n in names}
    assert not (codes(fold["train"]) & codes(fold["val"]))
    assert not (codes(fold["id"]) & (codes(fold["train"]) | codes(fold["val"])))
    # same test set in every fold; val rotates
    assert all(f["id"] == fold["id"] for f in folds)
    assert folds[1]["val"] != fold["val"]
    # OOD splits point at existing augmented files
    for shift in ("ood_noise", "ood_blur", "ood_contrast", "ood_jpeg"):
        assert len(fold[shift]) == len(fold["id"])
        for rel in fold[shift]:
            assert (root / "preprocessed" / rel).exists()
    # block reduction happened: 128 -> 64
    img = np.load(root / "preprocessed" / fold["id"][0])
    assert img.shape == (64, 64)

    # loads through the standard dataset class, 4 rater masks
    splits_pkl = root / "splits" / "ood_aug" / "firstCycle" / "splits.pkl"
    ds = MultiRaterDataset(splits_pkl, root, split="id")
    item = ds.load(0)
    assert item["seg"].shape == (4, 64, 64)
    assert item["image"].shape[:2] == (64, 64)

    # OOD images differ from clean but masks/layout are shared
    ood = MultiRaterDataset(splits_pkl, root, split="ood_noise")
    clean = ds.load(0)["image"]
    noisy = ood.load(0)["image"]
    assert clean.shape == noisy.shape and not np.allclose(clean, noisy)


def test_cv_split_determinism():
    patient_images = {f"LIDC-IDRI-{i:04d}": [f"{i:04d}_000.npy"] for i in range(1, 11)}
    a = build_cv_splits(patient_images, num_splits=4, test_ratio=0.2, seed=7)
    b = build_cv_splits(patient_images, num_splits=4, test_ratio=0.2, seed=7)
    assert a == b
    c = build_cv_splits(patient_images, num_splits=4, test_ratio=0.2, seed=8)
    assert a[0]["id"] != c[0]["id"] or a[0]["val"] != c[0]["val"]
