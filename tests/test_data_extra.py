"""Tests: custom augmentations, OOD generators, offline preprocessing."""

import numpy as np
import pytest

from diffuncertainty_tpu.data import augment_extra as ax
from diffuncertainty_tpu.data import cityscapes_labels as cs
from diffuncertainty_tpu.data import ood
from diffuncertainty_tpu.data.dataset import MultiRaterDataset, load_splits
from diffuncertainty_tpu.data.preprocess import (
    generate_splits,
    pad_to_multiple,
    preprocess_dataset_2d,
    zscore_normalize,
)
from diffuncertainty_tpu.data.toy import generate_toy_dataset


def test_label_switches_only_touch_switchable(rng):
    mask = np.zeros((8, 8), np.int32)
    mask[0] = cs.name2trainId["road"]
    mask[1] = cs.name2trainId["sky"]  # not switchable
    out = ax.stochastic_label_switches(mask, np.random.default_rng(0), 20)
    assert out.shape == (20, 8, 8)
    assert set(np.unique(out[:, 1])) == {cs.name2trainId["sky"]}
    road_vals = set(np.unique(out[:, 0]))
    assert road_vals <= {cs.name2trainId["road"], cs.name2trainId["road_2"]}
    assert len(road_vals) == 2  # with 20 draws at p=4/17, both outcomes occur


def test_gt_switch_uncertainty_map():
    label = np.full((4, 4), cs.name2trainId["car"], np.int32)
    unc = cs.gt_switch_uncertainty_map(label)
    p = 1.0 / 3.0
    expected = (1 - p) * p**2 + p * (1 - p) ** 2
    np.testing.assert_allclose(unc, expected, rtol=1e-6)


def test_sample_normalize():
    x = np.random.default_rng(0).random((8, 8, 3)) * 10 + 5
    out = ax.sample_normalize(x)
    assert abs(out.mean()) < 1e-5 and abs(out.std() - 1) < 1e-5


def test_sdf_deform_changes_mask_but_preserves_labels(rng):
    r = np.random.default_rng(0)
    mask = np.zeros((32, 32), np.int32)
    mask[8:24, 8:24] = 1
    mask[12:20, 12:20] = 2
    image = (mask > 0).astype(np.float32) + 0.1 * r.standard_normal((32, 32))
    out = ax.intensity_guided_sdf_deform(image, mask, r)
    assert out.shape == mask.shape
    assert set(np.unique(out)) <= {0, 1, 2}
    assert np.any(out != mask)  # actually deformed


def test_fov_flash_filtered_noise_shapes(rng):
    r = np.random.default_rng(1)
    img = r.random((32, 32, 3)).astype(np.float32)
    fov = ood.ood_fov(img, r)
    assert fov.shape == img.shape and fov.min() >= 0
    # corners should be fully masked for default radius
    assert fov[0, 0].max() == 0.0
    flash = ood.ood_flash(img, r)
    assert flash.shape == img.shape and float(flash.max()) <= 1.0
    noisy = ood.ood_filtered_noise(img, r)
    assert noisy.shape == img.shape
    # zero-intensity pixels stay unchanged (noise is intensity-modulated)
    z = np.zeros((8, 8), np.float32)
    np.testing.assert_array_equal(ood.ood_filtered_noise(z, r), z)


def test_pixel_corruptions(rng):
    r = np.random.default_rng(2)
    img = r.random((32, 32)).astype(np.float32)
    noisy = ood.ood_noise(img, r, std=0.3)
    assert noisy.max() > 1.0 or noisy.min() < 0.0  # no clipping
    blurred = ood.ood_blur(img, r)
    assert blurred.std() < img.std()
    jpg = ood.ood_jpeg(img, r, quality=10)
    assert jpg.shape == img.shape and jpg.dtype == np.float32
    eq = ood.ood_contrast(img, r)
    assert eq.shape == img.shape and 0 <= eq.min() and eq.max() <= 1
    gibbs = ood.ood_gibbs(img, r)
    assert gibbs.shape == img.shape


def test_generate_ood_split_registers_split(tmp_path):
    toy = generate_toy_dataset(tmp_path / "toy", num_train=4, num_val=2, num_test=3,
                               num_ood=2, size=16, seed=0)
    new_ids = ood.generate_ood_split(toy, "ood_jpeg", source_split="id")
    assert len(new_ids) == 3
    ds = MultiRaterDataset(
        toy / "splits" / "default" / "firstCycle" / "splits.pkl", toy, split="ood_jpeg"
    )
    assert len(ds) == 3
    s = ds.load(0)
    assert s["image"].shape == (16, 16, 3)
    paired = MultiRaterDataset(
        toy / "splits" / "default" / "firstCycle" / "splits.pkl", toy, split="id&ood_jpeg"
    )
    assert len(paired) == 6


def test_preprocess_and_split_generation(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    r = np.random.default_rng(0)
    for patient in range(6):
        for slice_idx in range(2):
            base = f"p{patient:02d}_{slice_idx}"
            np.save(raw / f"{base}.npy", r.random((30, 29)).astype(np.float32))
            for rater in range(3):
                np.save(raw / f"{base}_{rater:02d}_mask.npy",
                        r.integers(0, 2, (30, 29)).astype(np.uint8))
    out = tmp_path / "ds"
    ids = preprocess_dataset_2d(raw, out, num_raters=3, patch_multiple=16)
    assert len(ids) == 12
    img = np.load(out / "preprocessed" / ids[0])
    assert img.shape == (32, 32)  # padded to multiple
    assert abs(float(img[1:-1, 1:-2].mean())) < 1.0  # z-scored-ish

    splits_path = generate_splits(out, ids, num_raters=3, dataset_name="test3raters",
                                  test_fraction=0.3, val_fraction=0.2)
    folds = load_splits(splits_path)
    fold = folds[0]
    # patient-disjoint: no patient appears in two splits
    def patients(lst):
        return {Path(x).stem.rsplit("_", 1)[0] for x in lst}

    from pathlib import Path

    assert not (patients(fold["train"]) & patients(fold["id"]))
    assert not (patients(fold["train"]) & patients(fold["val"]))
    ds = MultiRaterDataset(splits_path, out, split="train", num_raters=3)
    assert len(ds) > 0
    assert ds.load(0)["seg"].shape[0] == 3


def test_zscore_and_pad():
    x = np.ones((5, 7)) * 3
    z = zscore_normalize(x)
    assert abs(float(z.mean())) < 1e-6
    p = pad_to_multiple(x, 8)
    assert p.shape == (8, 8)


def test_mask_elastic_deform_preserves_labelset():
    r = np.random.default_rng(0)
    mask = np.zeros((32, 32), np.int32)
    mask[10:20, 10:20] = 1
    out = ax.mask_elastic_deform(mask, r)
    assert set(np.unique(out)) <= {0, 1}


def test_volume_to_slices(tmp_path):
    from diffuncertainty_tpu.data.preprocess import preprocess_volumes_to_slices

    raw = tmp_path / "vols"
    raw.mkdir()
    r = np.random.default_rng(0)
    vol = r.random((8, 20, 24)).astype(np.float32)
    masks = np.zeros((2, 8, 20, 24), np.uint8)
    masks[:, 3:5, 5:10, 5:10] = 1  # foreground only on slices 3-4
    np.save(raw / "case0.npy", vol)
    for i in range(2):
        np.save(raw / f"case0_{i:02d}_mask.npy", masks[i])

    center = preprocess_volumes_to_slices(raw, tmp_path / "c", num_raters=2, mode="center",
                                          patch_multiple=8)
    assert center == ["images/case0.npy"]
    fg = preprocess_volumes_to_slices(raw, tmp_path / "f", num_raters=2, mode="foreground",
                                      patch_multiple=8)
    assert fg == ["images/case0_z003.npy", "images/case0_z004.npy"]
    img = np.load(tmp_path / "f" / "preprocessed" / fg[0])
    assert img.shape == (24, 24)  # padded to multiple of 8


def test_geometric_transform_whitelist():
    """TTA whitelist guard: supported geometric + known non-geometric pass;
    Affine, VerticalFlip, and transforms the table has never seen raise."""
    import pytest

    from diffuncertainty_tpu.data.augment import check_geometric_transform_support

    # a reference-style TRAIN tree with only supported/known entries passes
    ok = {"TRAIN": [
        {"HorizontalFlip": {"p": 0.5}},
        {"Rotate": {"limit": 22.5, "border_mode": 0}},
        {"RandomScale": {"scale_limit": [-0.2, 0.2]}},
        {"PadIfNeeded": {"min_height": 64, "min_width": 64}},
        {"CenterCrop": {"height": 64, "width": 64}},
        {"GaussNoise": {"var_limit": 0.01}},
        {"Normalize": {"mean": 0.0, "std": 1.0}},
    ]}
    check_geometric_transform_support(ok)  # no raise

    for bad in ("Affine", "VerticalFlip", "ElasticTransform", "D4"):
        with pytest.raises(ValueError, match=bad):
            check_geometric_transform_support(
                {"TRAIN": [{"HorizontalFlip": {"p": 0.5}}, {bad: {"p": 1.0}}]})

    # unknown CamelCase transforms fail closed instead of silently narrowing
    with pytest.raises(ValueError, match="SomeFutureWarp"):
        check_geometric_transform_support({"TRAIN": [{"SomeFutureWarp": {}}]})

    # section keys (TRAIN/VAL) and snake_case parameter keys never trip it
    check_geometric_transform_support(
        {"VAL": [], "TEST": [{"Rotate": {"interpolation": 1, "mask_value": 0}}]})
