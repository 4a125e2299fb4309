"""Cityscapes dataset and combined variable-rater schema tests."""

import numpy as np
import pytest

from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
from diffuncertainty_tpu.data import cityscapes_labels as cs
from diffuncertainty_tpu.data.cityscapes import CityscapesDataset, preprocess_gta_cityscapes
from diffuncertainty_tpu.data.dataset import save_splits
from diffuncertainty_tpu.data.preprocess import generate_splits


@pytest.fixture()
def gta_dir(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.random((64, 128, 3)).astype(np.float32)
        mask = rng.integers(0, 19, (64, 128)).astype(np.uint8)
        mask[:8] = cs.name2trainId["road"]
        np.save(raw / f"frame_{i}.npy", img)
        np.save(raw / f"frame_{i}_mask.npy", mask)
    out = tmp_path / "gta"
    ids = preprocess_gta_cityscapes(raw, out, size=(32, 64))
    generate_splits(out, ids, dataset_name="gta", num_raters=1,
                    patient_disjoint=False, test_fraction=0.34, val_fraction=0.17)
    return out


def test_cityscapes_reference_sampling(gta_dir):
    splits = gta_dir / "splits" / "default" / "firstCycle" / "splits.pkl"
    ds = CityscapesDataset(splits, gta_dir, split="train", n_reference_samples=3)
    s = ds.load(0)
    assert s["image"].shape == (32, 64, 3)
    assert s["seg"].shape == (3, 32, 64)
    # references are stable per image
    s2 = ds.load(0)
    np.testing.assert_array_equal(s["seg"], s2["seg"])
    # road pixels are either road or road_2
    vals = set(np.unique(s["seg"][:, :8 // 2]))
    assert vals <= set(cs.trainId2name)


def test_cityscapes_train_mode_single_mask(gta_dir):
    splits = gta_dir / "splits" / "default" / "firstCycle" / "splits.pkl"
    ds = CityscapesDataset(splits, gta_dir, split="train", return_all_raters=False)
    s = ds.load(0, np.random.default_rng(0))
    assert s["seg"].ndim == 2


def _make_mini_dataset(root, name, n_images, n_raters, size=16):
    img_dir = root / name / "preprocessed" / "images"
    lbl_dir = root / name / "preprocessed" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(hash(name) % 1000)
    ids = []
    for i in range(n_images):
        base = f"{name}_{i:03d}"
        np.save(img_dir / f"{base}.npy", rng.random((size, size)).astype(np.float32))
        for r in range(n_raters):
            np.save(lbl_dir / f"{base}_{r:02d}_mask.npy",
                    rng.integers(0, 2, (size, size)).astype(np.uint8))
        ids.append(f"{name}/images/{base}.npy")
    return ids


def test_combined_schema_variable_raters(tmp_path):
    ids_a = _make_mini_dataset(tmp_path, "retinaA", 3, 5)
    ids_b = _make_mini_dataset(tmp_path, "retinaB", 2, 7)
    combined_dir = tmp_path / "combined_retina"
    fold = {
        "_meta": {
            "schema": "combined_retina",
            "dataset_configs": {
                "retinaA": {"num_raters": 5},
                "retinaB": {"num_raters": 7},
            },
        },
        "train": ids_a + ids_b,
    }
    splits = combined_dir / "splits.pkl"
    save_splits([fold], splits)
    ds = MultiRaterDataset(splits, combined_dir, split="train")
    assert len(ds) == 5
    assert ds.num_raters == 7  # max across datasets
    a = ds.load(0)
    b = ds.load(4)
    assert a["seg"].shape[0] == 5 and a["dataset"] == "retinaA"
    assert b["seg"].shape[0] == 7 and b["dataset"] == "retinaB"

    # loader pads the rater axis and reports true counts
    loader = BatchLoader(ds, batch_size=5)
    batch = next(iter(loader))
    assert batch["seg"].shape[1] == 7
    assert sorted(batch["num_raters"].tolist()) == [5, 5, 5, 7, 7]
