"""Raw LIDC DICOM->crop stage on synthetic scans, chained into the importer.

The pylidc *reader* is external (archive + package unavailable); everything
downstream of it — clustering, consensus filter, shared-grid cubic resample,
positive-slice extraction, file contract — is exercised here on synthetic
CT-like volumes with analytically-known nodules.
"""

import ast
import csv

import numpy as np
import pytest

from diffuncertainty_tpu.data.lidc_raw import (
    CropConfig,
    RaterAnnotation,
    ScanRecord,
    cluster_annotations,
    consensus_extent_vox,
    crops_to_aggregated_pickle,
    extract_nodule_crops,
    resample_mask_at,
    save_crops,
    uniform_cubic_resample,
)

SPACING = (1.0, 1.0, 2.0)  # mm per voxel (y, x, z) — anisotropic like CT


def _ball_annotation(shape, center_vox, radius_mm, spacing=SPACING, features=None):
    """Spherical (in mm) nodule mask stored sparsely with an offset."""
    c = np.asarray(center_vox, float)
    s = np.asarray(spacing, float)
    r_vox = np.ceil(radius_mm / s).astype(int) + 1
    lo = np.maximum((c - r_vox).astype(int), 0)
    hi = np.minimum((c + r_vox).astype(int) + 1, shape)
    grids = np.meshgrid(*[np.arange(lo[d], hi[d]) for d in range(3)], indexing="ij")
    dist2 = sum(((g - c[d]) * s[d]) ** 2 for d, g in enumerate(grids))
    return RaterAnnotation(
        mask=dist2 <= radius_mm ** 2,
        offset=tuple(int(x) for x in lo),
        features=features or {"subtlety": 3, "malignancy": 2},
    )


def _scan(scan_id=1, patient="LIDC-IDRI-0001", shape=(80, 80, 40), uid="1.2.3.1"):
    # smooth linear HU field: exactly reproduced by trilinear interpolation
    yy, xx, zz = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = (0.5 * yy + 0.25 * xx + 1.5 * zz).astype(np.float32)
    anns = [
        # nodule A: three raters, same center, different radii
        _ball_annotation(shape, (30, 30, 20), 4.0),
        _ball_annotation(shape, (30, 30, 20), 5.0),
        _ball_annotation(shape, (31, 30, 20), 6.0),
        # nodule B: two raters, far away
        _ball_annotation(shape, (62, 62, 10), 5.0),
        _ball_annotation(shape, (62, 63, 10), 4.0),
    ]
    return ScanRecord(
        scan_id=scan_id, patient_id=patient, volume=vol,
        spacing=SPACING, annotations=anns, series_uid=uid,
    )


def test_cluster_annotations_groups_by_distance():
    scan = _scan()
    groups = cluster_annotations(scan.annotations, SPACING)
    assert [len(g) for g in groups] == [3, 2]
    # first group holds the first three annotations, in order
    assert groups[0] == scan.annotations[:3]
    assert groups[1] == scan.annotations[3:]


def test_cluster_caps_group_at_four_raters():
    shape = (40, 40, 20)
    anns = [_ball_annotation(shape, (20, 20, 10), 3.0 + 0.1 * i) for i in range(6)]
    groups = cluster_annotations(anns, SPACING)
    assert len(groups) == 1 and len(groups[0]) == 4


def test_consensus_extent_and_oversize_filter():
    shape = (120, 40, 20)
    small = [_ball_annotation(shape, (20, 20, 10), 5.0) for _ in range(2)]
    # 10% consensus of any-rater union: a 70-voxel-long blob trips the filter
    long_mask = np.zeros((70, 5, 3), bool)
    long_mask[:, 2, 1] = True
    big = [RaterAnnotation(mask=long_mask, offset=(25, 18, 8), features={})]
    assert consensus_extent_vox(small, 0.1) <= 13
    assert consensus_extent_vox(big, 0.1) == 70

    scan = ScanRecord(
        scan_id=2, patient_id="LIDC-IDRI-0002",
        volume=np.zeros(shape, np.float32) + 100.0,
        spacing=SPACING, annotations=small + big,
    )
    crops = extract_nodule_crops(scan, CropConfig())
    # only the small nodule survives; the oversize one is skipped
    assert len(crops) > 0
    assert all(c["nodule"] == 0 for c in crops)


def test_uniform_cubic_resample_geometry_and_values():
    scan = _scan()
    center = scan.annotations[0].centroid_vox()
    cube, coords = uniform_cubic_resample(
        scan.volume, SPACING, center, side_mm=63.0, voxel_mm=1.0)
    assert cube.shape == (64, 64, 64)
    assert coords.shape == (3, 64, 64, 64)
    # linear field: the cube center sample must equal the field at the center
    # interpolation point (z snapped to the nearest acquired slice)
    cy, cx, cz = coords[:, 32, 32, 32]
    expected = 0.5 * cy + 0.25 * cx + 1.5 * cz
    np.testing.assert_allclose(cube[32, 32, 32], expected, rtol=1e-5)
    # raw z sampling: z coords are integers (acquired slices)
    np.testing.assert_array_equal(coords[2], np.round(coords[2]))
    # z-axis physical step is 63/63 mm = 1 mm = half a slice -> snapping
    # reuses slices; the set of sampled z's stays within the scan
    assert coords[2].min() >= 0 and coords[2].max() <= scan.volume.shape[2] - 1

    # masks resampled on the SAME grid land centered with ~2r mm extent
    m = resample_mask_at(scan.annotations[1].dense(scan.volume.shape), coords)
    assert m[32, 32, 32]
    ys = np.argwhere(m.any(axis=(1, 2)))
    extent_mm = float(ys.max() - ys.min() + 1)  # 1 mm voxels
    assert 8.0 <= extent_mm <= 12.0  # radius 5 mm


def test_large_config_samples_128():
    cfg = CropConfig.large()
    assert cfg.samples_per_axis == 128
    assert CropConfig().samples_per_axis == 64


def test_save_crops_contract(tmp_path):
    scan = _scan()
    root = save_crops([scan], tmp_path / "lidc_small", CropConfig())
    images = sorted((root / "images").glob("*.npy"))
    assert images, "no crops written"
    # names: {scan:04d}_{idx:03d}.npy with a per-scan running slice counter
    stems = [p.stem for p in images]
    assert stems == [f"0001_{i:03d}" for i in range(len(stems))]
    for stem in stems:
        img = np.load(root / "images" / f"{stem}.npy")
        assert img.shape == (64, 64) and img.dtype == np.float32
        masks = [np.load(root / "labels" / f"{stem}_{r:02d}_mask.npy")
                 for r in range(4)]
        assert all(m.shape == (64, 64) for m in masks)
        # at least one rater positive on every saved slice
        assert any(m.any() for m in masks)
    # nodule A has 3 raters, B has 2 -> every crop's rater 3 mask is zero
    for stem in stems:
        m3 = np.load(root / "labels" / f"{stem}_03_mask.npy")
        assert not m3.any()

    with open(root / "metadata.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(stems)
    assert rows[0]["Patient ID"] == "LIDC-IDRI-0001"
    assert rows[0]["Scan ID"] == "0001"
    # feature cells are per-rater list reprs, None-padded to 4 raters, and
    # the segmentation paths a list repr — the reference's pandas cell format
    # (save_cropped_nodules_2d.py:38-58,131-144)
    malignancy = ast.literal_eval(rows[0]["malignancy"])
    assert len(malignancy) == 4 and malignancy[0] == 2 and malignancy[3] is None
    assert "internal Structure" in rows[0]
    seg_paths = ast.literal_eval(rows[0]["Segmentation Save Paths"])
    assert isinstance(seg_paths, list) and len(seg_paths) == 4
    assert seg_paths[0].endswith("_00_mask.npy")


def test_chain_raw_to_importer_contract(tmp_path):
    """raw scans -> 128px crops -> aggregated pickle -> on-disk contract."""
    from diffuncertainty_tpu.data.dataset import MultiRaterDataset, load_splits
    from diffuncertainty_tpu.data.lidc_import import main as lidc_main

    scans, rows, uid_by_scan = [], [], {}
    for p in range(4):
        uid = f"1.2.3.{p}"
        scans.append(_scan(scan_id=p + 1, patient=f"LIDC-IDRI-{p + 1:04d}", uid=uid))
        rows.append((f"LIDC-IDRI-{p + 1:04d}", uid))
        uid_by_scan[f"{p + 1:04d}"] = uid
    crop_root = save_crops(scans, tmp_path / "crops", CropConfig.large())
    img = np.load(next(iter(sorted((crop_root / "images").glob("*.npy")))))
    assert img.shape == (128, 128)

    pkl = crops_to_aggregated_pickle(
        crop_root, tmp_path / "data_lidc.pickle", uid_by_scan)
    meta = tmp_path / "LIDC-IDRI_MetaData.csv"
    with open(meta, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Subject ID", "Series ID"])
        w.writerows(rows)

    lidc_main([
        "--pickle-path", str(pkl), "--metadata-csv", str(meta),
        "--out-root", str(tmp_path), "--image-size", "64",
        "--num-splits", "2", "--test-ratio", "0.25", "--seed", "3",
    ])
    root = tmp_path / "origlidc64"
    folds = load_splits(root / "splits" / "ood_aug" / "firstCycle" / "splits.pkl")
    ds = MultiRaterDataset(
        root / "splits" / "ood_aug" / "firstCycle" / "splits.pkl", root, split="id")
    item = ds.load(0)
    assert item["seg"].shape == (4, 64, 64)
    assert item["image"].shape[:2] == (64, 64)
