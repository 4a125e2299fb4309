"""NPC 3D MRI pipeline on a synthetic H5 fixture."""

import pickle

import h5py
import numpy as np
import pytest

from diffuncertainty_tpu.data.npc import (
    create_npc_augmented_ood,
    extract_patient_id,
    gen_splits_npc,
    gibbs_noise,
    histogram_shift,
    process_npc,
    rician_noise,
)


@pytest.fixture
def npc_raw(tmp_path):
    """Synthetic MMIS-2024 tree: H5 volumes with t1/t1c/t2 + 4 rater labels."""
    rng = np.random.default_rng(0)
    d, h, w = 6, 40, 48  # non-square to exercise the center square crop

    def write_volume(path, seed, labeled_slices):
        r = np.random.default_rng(seed)
        with h5py.File(path, "w") as f:
            for key, scale in [("t1", 900.0), ("t1c", 1.3), ("t2", 400.0)]:
                f[key] = (r.random((d, h, w)) * scale).astype(np.float32)
            for a in range(1, 5):
                lab = np.zeros((d, h, w), np.uint8)
                for s in labeled_slices:
                    cy, cx = 20 + a, 24 - a
                    yy, xx = np.mgrid[:h, :w]
                    lab[s] = (((yy - cy) ** 2 + (xx - cx) ** 2) <= 36).astype(np.uint8)
                f[f"label_a{a}"] = lab

    train = tmp_path / "raw" / "training"
    val = tmp_path / "raw" / "validation"
    train.mkdir(parents=True)
    val.mkdir(parents=True)
    write_volume(train / "patient0.h5", 1, labeled_slices=[1, 2])
    write_volume(train / "patient1.h5", 2, labeled_slices=[3])
    write_volume(val / "patient7.h5", 3, labeled_slices=[0, 4])
    return tmp_path / "raw"


def test_process_npc(tmp_path, npc_raw):
    root = tmp_path / "npc32"
    rows = process_npc(npc_raw / "training", npc_raw / "validation",
                       root / "preprocessed", image_size=32)
    # only labeled slices survive: 2 + 1 + 2
    assert len(rows) == 5
    ids = [r["sample_id"] for r in rows]
    assert "train0_slice001" in ids and "val7_slice000" in ids
    img = np.load(root / "preprocessed" / "images" / "train0_slice001.npy")
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-6
    masks = sorted((root / "preprocessed" / "labels").glob("train0_slice001_*.npy"))
    assert len(masks) == 4
    assert all(np.load(m).shape == (32, 32) for m in masks)
    assert any(np.load(m).any() for m in masks)


def test_npc_splits_patient_disjoint_and_ood(tmp_path, npc_raw):
    root = tmp_path / "npc32"
    process_npc(npc_raw / "training", npc_raw / "validation",
                root / "preprocessed", image_size=32)
    out = gen_splits_npc(root, train_ratio=0.4, val_ratio=0.3, test_ratio=0.3, seed=0)
    folds = pickle.loads(out.read_bytes())
    assert len(folds) == 1
    fold = folds[0]

    def patients(paths):
        return {extract_patient_id(p.split("/")[-1].split(".")[0]) for p in paths}

    groups = [patients(fold[k]) for k in ("train", "val", "id") if len(fold[k])]
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            assert not (groups[i] & groups[j]), "patients leak across splits"
    # ood splits mirror id with augmented/ prefixes
    for shift in ("ood_noise", "ood_hist", "ood_gibbs"):
        assert len(fold[shift]) == len(fold["id"])
        assert all(p.startswith(f"augmented/{shift}/") for p in fold[shift])

    counts = create_npc_augmented_ood(root, seed=0)
    for shift, n in counts.items():
        assert n == len(fold["id"])
        for rel in fold[shift]:
            f = root / "preprocessed" / rel
            assert f.exists()
            aug = np.load(f)
            orig = np.load(root / "preprocessed" / "images" / f.name)
            assert aug.shape == orig.shape
            assert np.abs(aug - orig).max() > 1e-4  # actually shifted


def test_npc_ood_transforms_properties(rng):
    img = rng.random((24, 24)).astype(np.float32)
    noisy = rician_noise(img, np.random.default_rng(1))
    assert noisy.shape == img.shape and (noisy >= 0).all()  # Rician is nonneg
    shifted = histogram_shift(img, np.random.default_rng(2))
    # monotone remap preserves ordering of distinct values
    a, b = img[0, 0], img[5, 5]
    if a < b:
        assert shifted[0, 0] <= shifted[5, 5] + 1e-6
    g = gibbs_noise(img, np.random.default_rng(3))
    assert g.shape == img.shape
    # low-pass: reduces high-frequency energy
    hf = lambda x: float(np.abs(np.diff(x, axis=0)).mean())
    assert hf(g) < hf(img)
