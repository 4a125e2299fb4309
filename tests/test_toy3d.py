"""Toy 3D controlled cases (ValUES R1) — generation, ambiguity, splits, slicing."""

import pickle

import numpy as np
import pytest

from diffuncertainty_tpu.data.preprocess import preprocess_volumes_to_slices
from diffuncertainty_tpu.data.toy3d import (
    CASE_CONFIGS,
    ToyCaseConfig,
    create_splits_toy,
    generate_case,
    generate_chunk,
    rater_thresholds,
    shape_to_volume,
)


def test_shape_volumes():
    s = shape_to_volume("sphere", 16)
    c = shape_to_volume("cube", 16)
    assert s.shape == c.shape == (16, 16, 16)
    assert c.sum() == 16 ** 3
    # sphere fills ~pi/6 of the cube
    assert 0.4 < s.mean() < 0.6
    assert s[0, 0, 0] == 0 and s[8, 8, 8] == 1


def test_rater_thresholds_controlled_ambiguity():
    from scipy.ndimage import gaussian_filter

    vol = shape_to_volume("sphere", 20)
    img = np.zeros((48, 48, 48), np.float32)
    img[10:30, 10:30, 10:30] = vol
    img = gaussian_filter(img, sigma=2)
    thr = rater_thresholds(img, n_raters=3, all_raters_same=False)
    assert len(thr) == 3
    # thresholds descend with rater index -> nested masks of increasing area
    areas = [(img >= t).sum() for t in thr]
    assert 0 < areas[0] < areas[1] < areas[2]
    same = rater_thresholds(img, 3, all_raters_same=True)
    assert np.allclose(same, 0.1)


def test_generate_chunk_blur_noise_border(tmp_path):
    cfg = ToyCaseConfig(save_dir="imagesTr", n_samples=3, image_size=(32, 32, 32),
                        blur=True, gauss_sigma=2, noise=True, n_raters=3, seed=7)
    ids = generate_chunk(cfg, tmp_path / "case")
    assert ids == ["0000", "0001", "0002"]
    img = np.load(tmp_path / "case" / "imagesTr" / "0000.npy")
    assert img.shape == (32, 32, 32) and img.dtype == np.float32
    masks = sorted((tmp_path / "case" / "imagesTr").glob("0000_*_mask.npy"))
    assert len(masks) == 3
    m = [np.load(p) for p in masks]
    # ambiguity: raters differ, nested ordering (rater 0 tightest)
    assert m[0].sum() <= m[1].sum() <= m[2].sum()
    assert m[0].sum() < m[2].sum()
    # noise lives in the background
    assert (img[m[0] == 0] > 0.5).any()

    over = ToyCaseConfig(save_dir="imagesTs", n_samples=2, image_size=(32, 32, 32),
                         object_over_border=True, noise=True, n_raters=1, seed=19)
    generate_chunk(over, tmp_path / "case")
    assert len(list((tmp_path / "case" / "imagesTs").glob("*_mask.npy"))) == 2


def test_case_configs_match_reference_design():
    assert set(CASE_CONFIGS) == {"Case_1", "Case_2", "Case_3a", "Case_3b"}
    c1 = CASE_CONFIGS["Case_1"]
    assert all(c.blur and not c.noise and c.n_raters == 3 and c.gauss_sigma == 2 for c in c1)
    c2 = CASE_CONFIGS["Case_2"]
    assert sum(c.n_samples for c in c2 if c.save_dir == "imagesTs") == 42
    assert any(c.shapes == ("cube",) for c in c2)
    assert any(c.object_over_border for c in c2)
    assert any(c.object_gray for c in c2)
    # 3b = 3a + the blurred 3-rater test chunk
    assert len(CASE_CONFIGS["Case_3b"]) == len(CASE_CONFIGS["Case_3a"]) + 1
    extra = CASE_CONFIGS["Case_3b"][-1]
    assert extra.blur and extra.n_raters == 3 and extra.save_dir == "imagesTs"


def test_generate_case_splits_and_slice(tmp_path):
    counts = generate_case("Case_1", tmp_path, scale=0.05)  # 10 train / 1 test
    root = tmp_path / "Case_1"
    assert counts["imagesTr"] == 10 and counts["imagesTs"] == 1
    out = create_splits_toy(root, n_splits=2)
    folds = pickle.loads(out.read_bytes())
    assert len(folds) == 2
    for fold in folds:
        assert len(fold["train"]) + len(fold["val"]) == 10
        assert len(fold["test"]) == 1
        assert not set(fold["train"]) & set(fold["val"])

    # 3D -> 2D slice contract feeds the standard dataset pipeline
    rel = preprocess_volumes_to_slices(
        root / "imagesTr", tmp_path / "toy2d", num_raters=3, mode="foreground",
        patch_multiple=32,
    )
    assert len(rel) > 10  # multiple foreground slices per volume
    img0 = np.load(tmp_path / "toy2d" / "preprocessed" / rel[0])
    assert img0.shape == (64, 64)
    base = rel[0].split("/")[-1][:-4]
    for r in range(3):
        m = np.load(tmp_path / "toy2d" / "preprocessed" / "labels" / f"{base}_{r:02d}_mask.npy")
        assert m.shape == (64, 64)
