"""Retina-family raw pipelines on synthetic raw-format fixtures.

Chaksu (5 experts x machines), RIGA (prime + 6 pencil variants), REFUGE
(case folders with 7 annotators) raw trees are synthesized, pushed through
the cleaning/processing/split generators, and the result is loaded back
through the MultiRaterDataset combined-schema contract.
"""

import numpy as np
import pytest
from PIL import Image

from diffuncertainty_tpu.data.retina import (
    build_label,
    clean_riga,
    gen_splits_chaksu,
    gen_splits_retina,
    get_bbox_center,
    get_bbox_diameter,
    keep_largest_component,
    label_concentric_rings,
    process_chaksu,
    process_refuge,
    process_riga,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def _fundus_image(h=96, w=96, cy=48, cx=48, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = 90
    disk = _disk(h, w, cy, cx, 20)
    img[disk] = (200, 120, 60)
    img += rng.integers(0, 10, img.shape).astype(np.uint8)
    return img


# --------------------------------------------------------------------------
# unit helpers
# --------------------------------------------------------------------------

def test_keep_largest_component():
    m = np.zeros((20, 20), bool)
    m[2:10, 2:10] = True  # big
    m[15:17, 15:17] = True  # small
    out = keep_largest_component(m)
    assert out[5, 5] and not out[15, 15]


def test_label_concentric_rings_recovers_regions():
    h = w = 80
    outer = _disk(h, w, 40, 40, 25) & ~_disk(h, w, 40, 40, 23)
    inner = _disk(h, w, 40, 40, 12) & ~_disk(h, w, 40, 40, 10)
    out = label_concentric_rings(outer | inner)
    assert out[0, 0] == 0  # outside
    assert out[40 - 17, 40] == 1  # donut
    assert out[40, 40] == 2  # center
    assert set(np.unique(out)) == {0, 1, 2}


# --------------------------------------------------------------------------
# Chaksu
# --------------------------------------------------------------------------

@pytest.fixture
def chaksu_raw(tmp_path):
    """Raw Chaksu tree: 2 Remidio + 1 Bosch train images, 1 Remidio test,
    5 experts with Disc/Cup annotation PNGs."""
    experts = [f"Expert{i}" for i in range(1, 6)]
    h = w = 96

    def write_sample(image_dir, label_dir, machine, stem, seed):
        rng = np.random.default_rng(seed)
        cy, cx = 48 + rng.integers(-6, 6), 48 + rng.integers(-6, 6)
        (image_dir / machine).mkdir(parents=True, exist_ok=True)
        Image.fromarray(_fundus_image(h, w, cy, cx, seed)).save(
            image_dir / machine / f"{stem}.png")
        for k, expert in enumerate(experts):
            r_disc = 18 + k  # rater disagreement
            r_cup = 8 + (k % 3)
            for kind, r in (("Disc", r_disc), ("Cup", r_cup)):
                d = label_dir / expert / machine / kind
                d.mkdir(parents=True, exist_ok=True)
                m = _disk(h, w, cy, cx, r).astype(np.uint8) * 255
                # speckle noise blob to exercise largest-component cleaning
                m[2:4, 2:4] = 255
                Image.fromarray(m).save(d / f"{stem}.png")

    root = tmp_path / "chaksu_raw"
    for split, stems in [("Train", ["im1", "im2"]), ("Test", ["im3"])]:
        img_dir = root / split / "images"
        lab_dir = root / split / "labels"
        for i, stem in enumerate(stems):
            write_sample(img_dir, lab_dir, "Remidio", stem, seed=10 * i + 1)
        if split == "Train":
            write_sample(img_dir, lab_dir, "Bosch", "imb", seed=99)
    return root


def test_process_chaksu_and_splits(tmp_path, chaksu_raw):
    dataset_root = tmp_path / "chaksu96"
    save = dataset_root / "preprocessed"
    rows = process_chaksu(
        chaksu_raw / "Train" / "images", chaksu_raw / "Test" / "images",
        chaksu_raw / "Train" / "labels", chaksu_raw / "Test" / "labels",
        save, image_size=32, disc_crop_dia=0.0, rel_sidelength=0.05,
    )
    assert len(rows) == 4  # 2 Remidio train + 1 Bosch train + 1 Remidio test
    machines = {r["machine"] for r in rows}
    assert machines == {"Remidio", "Bosch"}
    assert (save / "metadata.csv").exists()

    # outputs: image + 5 rater masks each, cup inside disc, classes {0,1,2}
    first = rows[0]
    img = np.load(save / "images" / first["image_file"])
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    for lf in first["label_files"].split(","):
        lab = np.load(save / "labels" / lf)
        assert lab.shape == (32, 32)
        assert set(np.unique(lab)).issubset({0, 1, 2})
        assert (lab == 2).sum() > 0 and (lab == 1).sum() > 0

    # scanner splits: 2 folds over the 2 Remidio train samples
    out = gen_splits_chaksu(dataset_root, num_splits=2, seed=0)
    import pickle

    folds = pickle.loads(out.read_bytes())
    assert len(folds) == 2
    for fold in folds:
        assert len(fold["train"]) + len(fold["val"]) == 2
        assert len(fold["id"]) == 1  # Remidio test
        assert len(fold["ood"]) == 1  # Bosch
        assert all(str(p).startswith("images/") for p in fold["train"])


# --------------------------------------------------------------------------
# RIGA
# --------------------------------------------------------------------------

@pytest.fixture
def riga_raw(tmp_path):
    """Prime tif + 6 pencil-ring variants per case, MESSIDOR clinic."""
    root = tmp_path / "riga_raw" / "MESSIDOR"
    root.mkdir(parents=True)
    h = w = 96
    for case in (1, 2):
        prime = _fundus_image(h, w, 48, 48, seed=case)
        Image.fromarray(prime).save(root / f"image{case}prime.tif")
        for k in range(1, 7):
            gt = prime.copy()
            r_disc, r_cup = 20 + k, 9 + (k % 4)
            for r in (r_disc, r_cup):
                ring = _disk(h, w, 48, 48, r) & ~_disk(h, w, 48, 48, r - 2)
                gt[ring] = (30, 30, 255)  # pencil annotation
            Image.fromarray(gt).save(root / f"image{case}-{k}.tif")
    return tmp_path / "riga_raw"


def test_clean_and_process_riga(tmp_path, riga_raw):
    cleaned = clean_riga(riga_raw, tmp_path / "riga_cleaned")
    primes = sorted(cleaned.glob("*_prime.png"))
    assert len(primes) == 2
    gts = sorted(cleaned.glob("*_gt*.png"))
    assert len(gts) == 12  # 6 per case
    lab = np.array(Image.open(gts[0]))
    assert set(np.unique(lab)).issubset({0, 1, 2})
    assert lab[48, 48] == 2  # cup at center
    assert lab[0, 0] == 0

    save = tmp_path / "riga96" / "preprocessed"
    n = process_riga(cleaned, save, image_size=32, crop_multiplier=2.0)
    assert n == 2
    imgs = sorted((save / "images").glob("*.npy"))
    assert len(imgs) == 2
    masks = sorted((save / "labels").glob("s_000000_*_mask.npy"))
    assert len(masks) == 6
    # mean-diameter cache written
    assert (save.parent / "mean_diam.json").exists()
    lab = np.load(masks[0])
    assert lab.shape == (32, 32) and (lab == 2).any() and (lab == 1).any()


# --------------------------------------------------------------------------
# REFUGE
# --------------------------------------------------------------------------

@pytest.fixture
def refuge_raw(tmp_path):
    root = tmp_path / "refuge_raw"
    h = w = 96
    for split_dir, stems in [("Training-400", ["T0001", "T0002"]), ("Test-400", ["V0001"])]:
        for stem in stems:
            case = root / split_dir / stem
            case.mkdir(parents=True)
            seed = hash(stem) % 100
            cy = cx = 48
            Image.fromarray(_fundus_image(h, w, cy, cx, seed)).save(case / f"{stem}.jpg")
            for k in range(1, 8):
                disc = _disk(h, w, cy, cx, 17 + k % 5).astype(np.uint8) * 255
                cup = _disk(h, w, cy, cx, 8 + k % 3).astype(np.uint8) * 255
                Image.fromarray(disc).save(case / f"{stem}_seg_disc_{k}.png")
                Image.fromarray(cup).save(case / f"{stem}_seg_cup_{k}.png")
    return root


def test_process_refuge(tmp_path, refuge_raw):
    save = tmp_path / "refuge96" / "preprocessed"
    n = process_refuge(refuge_raw, save, image_size=32, crop_multiplier=2.0)
    assert n == 3
    imgs = sorted((save / "images").glob("*.npy"))
    assert len(imgs) == 3
    assert {p.stem.split("_")[0] for p in imgs} == {"train", "test"}
    masks = sorted((save / "labels").glob("train_000000_*_mask.npy"))
    assert len(masks) == 7
    lab = np.load(masks[0])
    assert set(np.unique(lab)).issubset({0, 1, 2})


# --------------------------------------------------------------------------
# combined splits + dataset contract round trip
# --------------------------------------------------------------------------

def test_combined_retina_splits_load_through_dataset(tmp_path, chaksu_raw, refuge_raw):
    parent = tmp_path / "values_datasets"
    chaksu_root = parent / "chaksu96"
    refuge_root = parent / "refuge96"
    process_chaksu(
        chaksu_raw / "Train" / "images", chaksu_raw / "Test" / "images",
        chaksu_raw / "Train" / "labels", chaksu_raw / "Test" / "labels",
        chaksu_root / "preprocessed", image_size=32,
    )
    process_refuge(refuge_raw, refuge_root / "preprocessed", image_size=32)

    out = gen_splits_retina(
        {"chaksu96": chaksu_root, "refuge96": refuge_root},
        parent / "retina96" / "splits" / "random" / "firstCycle",
        train_ratio=0.5, val_ratio=0.2, seed=0,
    )
    import pickle

    folds = pickle.loads(out.read_bytes())
    assert len(folds) == 1
    fold = folds[0]
    total = len(fold["train"]) + len(fold["val"]) + len(fold["id_test"])
    assert total == 7  # 4 chaksu + 3 refuge
    assert fold["_meta"]["dataset_configs"]["chaksu96"]["num_raters"] == 5
    assert fold["_meta"]["dataset_configs"]["refuge96"]["num_raters"] == 7
    np.testing.assert_array_equal(fold["ood_fov"], fold["id_test"])

    # load through the combined-schema dataset: variable rater counts
    from diffuncertainty_tpu.data.dataset import MultiRaterDataset

    ds = MultiRaterDataset(out, parent / "retina96", split="train")
    assert len(ds) == len(fold["train"])
    sample = ds.load(0)
    assert sample["image"].shape == (32, 32, 3)
    n_r = sample["seg"].shape[0]
    assert n_r in (5, 7)
