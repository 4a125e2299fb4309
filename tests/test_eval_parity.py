"""L6 evaluation-stack oracles against the reference's OWN evaluation code.

Imports ``/root/reference/evaluation`` read-only (hydra / medpy /
jsbeautifier / pytorch_lightning stubbed — see ``_install_ref_stubs``) and
diffs this repo's metric/aggregation implementations against the reference
functions two ways:

1. **function-level** on shared random inputs: rc_curve_stats / aurc / eaurc
   (``evaluation/metrics/aurc.py:14-67``), compute_ncc (``ncc.py:9-44``,
   ddof=1 quirk), calc_ace / calc_ece / calc_eqace + platt_scale_confid
   (``ace.py:325-407``), the pure C3 aggregations
   (``aggregate_uncertainties.py:16-130``), and the foreground-quantile /
   threshold core (``find_threshold.py:10-113``);
2. **cross-stack over a repo-written results tree**: the reference's
   ``ExperimentDataloader`` + task mains (aggregation, failure detection,
   calibration incl. the 256-bin compressed Platt fit, NCC) read a tree
   written by THIS repo's ``ResultsWriter`` and must reproduce this repo's
   task outputs — the README's "either stack's downstream tooling can read
   the results tree" claim, exercised for real.

Orientation contract: medpy loads 2D TIFFs transposed relative to PIL (ITK
x,y order); the reference compensates with ``.T`` at
``experiment_dataloader.py:305-312``. The medpy stub reproduces medpy's
transpose (PIL read + ``.T``) so the compensation path is actually executed;
the tree uses NON-square images so any orientation slip fails loudly.

Known (measured) divergence: the reference's foreground-quantile pool
includes the ``_mean`` prediction PNG (``experiment_dataloader.py:142-148``
startswith filter); this repo pools only the per-sample PNGs. The
quantile test asserts exact parity on the shared per-sample pool and
records the with-mean delta.
"""

from __future__ import annotations

import importlib
import json
import shutil
import sys
import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from diffuncertainty_tpu.evaln import ResultsReader
from diffuncertainty_tpu.evaln.aggregation import (
    aggregate_uncertainties as repo_aggregate,
    area_normalized_aggregation as repo_area_norm,
    border_normalized_aggregation as repo_border_norm,
    compute_prediction_shape_stats as repo_shape_stats,
    find_threshold as repo_find_threshold,
    foreground_quantile as repo_foreground_quantile,
    image_level_aggregation as repo_image_level,
    patch_level_aggregation as repo_patch_level,
    threshold_aggregation as repo_threshold_agg,
)
from diffuncertainty_tpu.evaln.tasks import (
    calc_ace as repo_calc_ace,
    calc_ece as repo_calc_ece,
    calc_eqace as repo_calc_eqace,
    calibration as repo_calibration,
    compute_ncc as repo_compute_ncc,
    failure_detection as repo_failure_detection,
)
from diffuncertainty_tpu.metrics.aurc import (
    aurc as repo_aurc,
    eaurc as repo_eaurc,
    rc_curve_stats as repo_rc_curve_stats,
)

REFERENCE = Path("/root/reference")

# these tests diff against the reference checkout itself; on machines
# without it, skip the whole module instead of erroring in the fixtures
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# reference import scaffolding (read-only; unavailable deps stubbed)
# ---------------------------------------------------------------------------

def _install_ref_stubs():
    if "medpy" not in sys.modules:
        medpy = types.ModuleType("medpy")
        medpy_io = types.ModuleType("medpy.io")

        def _load(path):
            # medpy/ITK returns 2D images in (x, y) order — transposed
            # relative to PIL's row-major (y, x). Reproduce that so the
            # reference's compensating .T (experiment_dataloader.py:305-312)
            # actually runs against this stub.
            return np.asarray(Image.open(path)).T, None

        def _save(arr, path):
            Image.fromarray(np.asarray(arr, np.float32).T, mode="F").save(path)

        medpy_io.load = _load
        medpy_io.save = _save
        medpy.io = medpy_io
        sys.modules["medpy"] = medpy
        sys.modules["medpy.io"] = medpy_io
    if "jsbeautifier" not in sys.modules:
        jsb = types.ModuleType("jsbeautifier")
        jsb.default_options = lambda: types.SimpleNamespace(indent_size=4)
        jsb.beautify = lambda s, opts=None: s
        sys.modules["jsbeautifier"] = jsb
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra_utils = types.ModuleType("hydra.utils")

        def _instantiate(config, *args, **kwargs):
            config = dict(config)
            config.pop("_recursive_", None)
            kwargs.pop("_recursive_", None)
            target = config.pop("_target_")
            module_name, fn_name = target.rsplit(".", 1)
            fn = getattr(importlib.import_module(module_name), fn_name)
            merged = {**config, **kwargs}
            return fn(*args, **merged)

        hydra_utils.instantiate = _instantiate
        hydra.utils = hydra_utils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra_utils
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.seed_everything = lambda seed, workers=False: None
        sys.modules["pytorch_lightning"] = pl


@pytest.fixture(scope="module")
def ref():
    """Namespace of reference evaluation modules (imported read-only)."""
    _install_ref_stubs()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    ns = types.SimpleNamespace(
        aurc=importlib.import_module("evaluation.metrics.aurc"),
        ncc=importlib.import_module("evaluation.metrics.ncc"),
        ace=importlib.import_module("evaluation.metrics.ace"),
        agg=importlib.import_module(
            "evaluation.uncertainty_aggregation.aggregate_uncertainties"),
        thr=importlib.import_module(
            "evaluation.uncertainty_aggregation.find_threshold"),
        shape=importlib.import_module(
            "evaluation.uncertainty_aggregation.prediction_shape_stats"),
        dataloader=importlib.import_module("evaluation.experiment_dataloader"),
        version=importlib.import_module("evaluation.experiment_version"),
    )
    return ns


# ---------------------------------------------------------------------------
# 1. function-level parity on shared random inputs
# ---------------------------------------------------------------------------

def test_rc_curve_and_aurc_parity(ref):
    rng = np.random.default_rng(0)
    for trial in range(200):
        n = int(rng.integers(1, 60))
        risks = rng.random(n)
        # heavy ties to exercise the tie-collapse emission
        confids = rng.integers(0, max(1, n // 3) + 1, n).astype(float)
        r_cov, r_sr, r_w = ref.aurc.rc_curve_stats(risks, confids)
        cov, sr, w = repo_rc_curve_stats(risks, confids)
        np.testing.assert_allclose(cov, r_cov, atol=1e-12)
        np.testing.assert_allclose(sr, r_sr, atol=1e-12)
        np.testing.assert_allclose(w, r_w, atol=1e-12)
        assert abs(repo_aurc(risks, confids) - ref.aurc.aurc(risks, confids)) < 1e-12
        assert abs(repo_eaurc(risks, confids) - ref.aurc.eaurc(risks, confids)) < 1e-12


def test_ncc_parity(ref):
    rng = np.random.default_rng(1)
    for _ in range(50):
        gt = rng.random((13, 21))
        pred = gt * rng.uniform(0.2, 2.0) + 0.1 * rng.random((13, 21))
        assert abs(repo_compute_ncc(gt, pred) - ref.ncc.compute_ncc(gt, pred)) < 1e-12
    # anti-correlated maps
    gt = rng.random((8, 8))
    assert abs(repo_compute_ncc(gt, -gt) - ref.ncc.compute_ncc(gt, -gt)) < 1e-12


def test_calibration_bin_parity(ref):
    rng = np.random.default_rng(2)
    for _ in range(30):
        n = int(rng.integers(50, 3000))
        correct = (rng.random(n) > 0.4).astype(int)
        confids = np.clip(rng.normal(0.6, 0.25, n), 0, 1)
        assert abs(repo_calc_ace(correct, confids) - ref.ace.calc_ace(correct, confids)) < 1e-12
        assert abs(repo_calc_ece(correct, confids) - ref.ace.calc_ece(correct, confids)) < 1e-12
        assert abs(repo_calc_eqace(correct, confids) - ref.ace.calc_eqace(correct, confids)) < 1e-12


def test_platt_scale_confid_parity(ref, tmp_path):
    params = {"TU": {"a": -1.7, "b": 0.45}}
    platt_file = tmp_path / "platt_scale_params.json"
    platt_file.write_text(json.dumps(params))
    rng = np.random.default_rng(3)
    unc = rng.random(500) * 3.0
    ref_confid = ref.ace.platt_scale_confid(-unc, platt_file, "TU")
    # repo applies the same mapping inline (tasks.py::calibration)
    a, b = params["TU"]["a"], params["TU"]["b"]
    repo_confid = 1.0 / (1.0 + np.exp((-unc) * a + b))
    np.testing.assert_allclose(repo_confid, ref_confid, atol=1e-15)


def test_aggregation_function_parity(ref, tmp_path):
    rng = np.random.default_rng(4)
    image = rng.random((24, 16)).astype(np.float64)

    r = ref.agg.image_level_aggregation(image, mean=True)
    assert abs(repo_image_level(image, mean=True)["max_score"] - r["max_score"]) < 1e-12
    r = ref.agg.image_level_aggregation(image, mean=False)
    assert abs(repo_image_level(image, mean=False)["max_score"] - r["max_score"]) < 1e-12

    r = ref.agg.patch_level_aggregation(image, 8)
    mine = repo_patch_level(image, 8)
    assert abs(mine["max_score"] - r["max_score"]) < 1e-10
    assert mine["bounding_box"] == [tuple(b) for b in r["bounding_box"]] or \
        [list(b) for b in mine["bounding_box"]] == r["bounding_box"]

    r = ref.agg.threshold_aggregation(image, threshold=0.7)
    mine = repo_threshold_agg(image, threshold=0.7)
    assert abs(mine["max_score"] - r["max_score"]) < 1e-12

    stats = {"img0": {"area": 37.0, "border": 21.0}}
    (tmp_path / "area.json").write_text(json.dumps(stats))
    r = ref.agg.area_normalized_aggregation(image, dataset_path=tmp_path, image_id="img0")
    mine = repo_area_norm(image, stats["img0"]["area"])
    assert abs(mine["max_score"] - r["max_score"]) < 1e-12
    r = ref.agg.border_normalized_aggregation(image, dataset_path=tmp_path, image_id="img0")
    mine = repo_border_norm(image, stats["img0"]["border"])
    assert abs(mine["max_score"] - r["max_score"]) < 1e-12


def test_foreground_quantile_core_parity(ref):
    rng = np.random.default_rng(5)
    for _ in range(20):
        seg = (rng.random((24, 16)) > rng.uniform(0.3, 0.9)).astype(np.uint8)
        assert abs(
            ref.thr.calculate_foreground_quantile_image(seg)
            - (1.0 - np.count_nonzero(seg) / seg.size)
        ) < 1e-15


# ---------------------------------------------------------------------------
# 2. cross-stack: reference eval code over a repo-written results tree
# ---------------------------------------------------------------------------

H, W = 24, 16  # NON-square so any orientation slip breaks loudly
N_IMAGES = 6
N_GROUPS = 3
N_RATERS = 4


@pytest.fixture(scope="module")
def repo_tree(ref, tmp_path_factory):
    """A results tree written by THIS repo's ResultsWriter + gt_seg PNGs."""
    from diffuncertainty_tpu.infer.results import ResultsWriter

    rng = np.random.default_rng(7)
    base = tmp_path_factory.mktemp("cross_stack")
    exp_path = base / "toymodel" / "test_results4" / "s0" / "e3"
    gt = {}
    for split in ("id", "val"):
        split_dir = exp_path / split
        with ResultsWriter(split_dir, binary=True) as writer:
            for i in range(N_IMAGES):
                iid = f"{split}_img{i}"
                soft = rng.random((H, W))
                groups = np.stack([(soft + 0.08 * rng.standard_normal((H, W))) > 0.5
                                   for _ in range(N_GROUPS)]).astype(np.uint8)
                mean_idx = (groups.mean(0) > 0.5).astype(np.uint8)
                writer.save_prediction(iid, groups, mean_idx)
                tu = np.abs(rng.standard_normal((H, W))).astype(np.float32)
                au = 0.6 * tu
                writer.save_uncertainty(iid, {"TU": tu, "AU": au, "EU": tu - au})
                writer.add_metrics(iid, "toy", {"dice": float(rng.uniform(0.3, 0.95))})
                # rater GT: jittered thresholds like the toy generator
                refs = np.stack([
                    (soft > 0.5 + 0.12 * rng.uniform(-1, 1)).astype(np.uint8)
                    for _ in range(N_RATERS)
                ])
                gt[iid] = refs
        # gt_seg PNGs: the reference's datamodule-free GT path
        # (experiment_dataloader.py get_reference_segs else-branch). The
        # reference loads these with medpy, which reads transposed relative
        # to PIL — gt_seg files in the reference ecosystem are medpy-written,
        # so store them transposed-on-disk (the medpy round-trip contract).
        gt_dir = split_dir / "gt_seg"
        gt_dir.mkdir()
        for i in range(N_IMAGES):
            iid = f"{split}_img{i}"
            for r in range(N_RATERS):
                Image.fromarray((gt[iid][r] * 255).T, mode="L").save(
                    gt_dir / f"{iid}_{r:02d}.png")
    return {"base": base, "exp_path": exp_path, "gt": gt}


class _GTDataset:
    """Duck-typed GT provider for the repo's ResultsReader (reference segs =
    the same gt_seg PNGs the reference reads, rescaled to {0,1}; the files
    are medpy-orientation on disk, so PIL reads compensate with ``.T``)."""

    def __init__(self, split_dir):
        self.split_dir = Path(split_dir)
        self.image_ids = sorted(
            {p.stem.rsplit("_", 1)[0] for p in (self.split_dir / "gt_seg").glob("*.png")}
        )

    def load(self, idx):
        iid = self.image_ids[idx]
        refs = np.stack([
            (np.asarray(Image.open(self.split_dir / "gt_seg" / f"{iid}_{r:02d}.png")).T > 0)
            .astype(np.uint8)
            for r in range(N_RATERS)
        ])
        return {"image_id": iid, "seg": refs, "num_raters": N_RATERS}


def _ref_version(ref, base, unc_types=("TU", "AU", "EU")):
    return ref.version.ExperimentVersion(
        base_path=Path(base),
        naming_scheme_version="s{seed}/e{epoch}",
        pred_model="toymodel",
        exp_name="{pred_model}",
        unc_types=list(unc_types),
        aggregations={
            "image_level": {
                "_target_": "evaluation.uncertainty_aggregation."
                            "aggregate_uncertainties.image_level_aggregation",
            },
            "patch_level": {
                "_target_": "evaluation.uncertainty_aggregation."
                            "aggregate_uncertainties.patch_level_aggregation",
                "patch_size": 8,
            },
        },
        seed=0,
        epoch=3,
        n_pred=4,
        data="lidc64",  # 4-rater dataset name for infer_num_raters
    )


def test_reference_reads_repo_tree_ids_and_maps(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    assert version.exp_path == repo_tree["exp_path"]
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    assert sorted(dl.image_ids) == [f"id_img{i}" for i in range(N_IMAGES)]
    # orientation contract: reference unc map == repo reader's unc map
    reader = ResultsReader(repo_tree["exp_path"] / "id")
    for iid in dl.image_ids:
        ref_map = dl.get_unc_map(iid, "TU")
        repo_map = reader.get_unc_map(iid, "TU")
        assert ref_map.shape == (H, W)
        np.testing.assert_array_equal(ref_map, repo_map)
        np.testing.assert_array_equal(dl.get_mean_pred_seg(iid) > 0,
                                      reader.get_mean_pred_seg(iid) > 0)
        # reference GT = gt_seg PNGs (0/255); repo dataset returns {0,1}
        np.testing.assert_array_equal(
            (dl.get_reference_segs(iid) > 0).astype(np.uint8),
            _GTDataset(repo_tree["exp_path"] / "id").load(
                _GTDataset(repo_tree["exp_path"] / "id").image_ids.index(iid))["seg"],
        )


def test_cross_stack_aggregation(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    split_dir = repo_tree["exp_path"] / "id"
    # reference aggregation writes aggregated_{unc}.json into the repo tree
    ref.agg.aggregate_uncertainties(dl, version.aggregations)
    ref_out = {u: json.loads((split_dir / f"aggregated_{u}.json").read_text())
               for u in ("TU", "AU", "EU")}
    for u in ("TU", "AU", "EU"):
        (split_dir / f"aggregated_{u}.json").unlink()
    # repo aggregation over the same tree
    repo_aggregate(ResultsReader(split_dir),
                   aggregations=("image_level", "patch_level"), patch_size=8)
    for u in ("TU", "AU", "EU"):
        repo_out = json.loads((split_dir / f"aggregated_{u}.json").read_text())
        assert repo_out.keys() == ref_out[u].keys()
        for key, aggs in repo_out.items():
            for agg_name in ("image_level", "patch_level"):
                assert abs(aggs[agg_name]["max_score"]
                           - ref_out[u][key][agg_name]["max_score"]) < 1e-5


def test_cross_stack_failure_detection(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    split_dir = repo_tree["exp_path"] / "id"
    if not (split_dir / "aggregated_TU.json").exists():
        repo_aggregate(ResultsReader(split_dir),
                       aggregations=("image_level", "patch_level"), patch_size=8)
    ref.aurc.main(dl)
    ref_out = json.loads((split_dir / "failure_detection.json").read_text())
    repo_out = repo_failure_detection(ResultsReader(split_dir))
    for u in ("TU", "AU", "EU"):
        for agg in ("image_level", "patch_level"):
            for metric in ("aurc", "eaurc"):
                assert abs(repo_out["mean"][u][agg]["metrics"][metric]
                           - ref_out["mean"][u][agg]["metrics"][metric]) < 1e-9


def test_cross_stack_threshold(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    split_dir = repo_tree["exp_path"] / "id"
    exp_path = repo_tree["exp_path"]

    # reference accumulated chain: quantiles -> per-version analysis files
    q_dict = ref.thr.get_foreground_quantile(dl)
    ref.thr.save_foreground_quantiles(q_dict)
    paths = ref.thr.threshold_images_paths(dl)
    ref.thr.find_threshold(paths)
    ref_quant = json.loads((exp_path / "quantile_analysis.json").read_text())
    ref_thresh = json.loads((exp_path / "threshold_analysis.json").read_text())
    for p in ("quantile_analysis.json", "threshold_analysis.json"):
        (exp_path / p).unlink()

    reader = ResultsReader(split_dir)
    repo_out = repo_find_threshold([reader], exp_path, pred_model="toymodel")
    repo_quant = json.loads((exp_path / "quantile_analysis.json").read_text())

    # measured divergence: the reference pools the _mean PNG too
    # (get_pred_seg_paths startswith filter); repo pools per-sample PNGs only
    sample_quants, all_quants = [], []
    for iid in reader.image_ids:
        for pred in reader.get_pred_segs(iid):
            sample_quants.append(1 - np.count_nonzero(pred) / pred.size)
    all_quants = q_dict["toymodel"][version.version_name]["quantiles"]
    assert len(all_quants) == len(sample_quants) + N_IMAGES  # + _mean per image
    assert abs(repo_quant["toymodel"] - np.mean(sample_quants)) < 1e-12
    delta = abs(ref_quant["toymodel"] - repo_quant["toymodel"])
    assert delta < 0.02, f"with-mean quantile delta unexpectedly large: {delta}"

    # thresholds at the two (slightly different) quantile levels
    for u in ("TU", "AU", "EU"):
        key = f"Mean {u} threshold"
        pooled = np.concatenate(
            [reader.get_unc_map(i, u).ravel() for i in reader.image_ids])
        expected_ref = float(np.quantile(pooled, ref_quant["toymodel"]))
        assert abs(ref_thresh["toymodel"][key] - expected_ref) < 1e-6
        assert abs(
            repo_out["toymodel"][key]
            - float(np.quantile(pooled, repo_quant["toymodel"]))
        ) < 1e-6


def test_cross_stack_ncc(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    split_dir = repo_tree["exp_path"] / "id"
    ref.ncc.main(dl)
    ref_out = json.loads((split_dir / "ambiguity_modeling.json").read_text())
    (split_dir / "ambiguity_modeling.json").unlink()
    from diffuncertainty_tpu.evaln.tasks import ambiguity_modeling

    repo_out = ambiguity_modeling(ResultsReader(split_dir, _GTDataset(split_dir)))
    for u in ("TU", "AU", "EU"):
        assert abs(repo_out["mean"][u]["metrics"]["ncc"]
                   - ref_out["mean"][u]["metrics"]["ncc"]) < 1e-9


def test_cross_stack_calibration_with_platt_fit(ref, repo_tree):
    """Full reference ace.main over the repo tree: 256-bin compressed Platt
    fit on the repo-written val split, then per-image + global calibration on
    id — against the repo's calibration task on the same tree."""
    version = _ref_version(ref, repo_tree["base"])
    exp_path = repo_tree["exp_path"]
    id_dir, val_dir = exp_path / "id", exp_path / "val"

    # repo first (fits its own platt params)
    repo_out = repo_calibration(
        ResultsReader(id_dir, _GTDataset(id_dir)),
        ResultsReader(val_dir, _GTDataset(val_dir)),
    )
    repo_platt = json.loads((exp_path / "platt_scale_params.json").read_text())
    (exp_path / "platt_scale_params.json").unlink()
    (id_dir / "calibration.json").unlink()

    dl = ref.dataloader.ExperimentDataloader(version, "id")
    ref.ace.main(dl)
    ref_out = json.loads((id_dir / "calibration.json").read_text())
    ref_platt = json.loads((exp_path / "platt_scale_params.json").read_text())

    for u in ("TU", "AU", "EU"):
        assert abs(repo_platt[u]["a"] - ref_platt[u]["a"]) < 1e-6, u
        assert abs(repo_platt[u]["b"] - ref_platt[u]["b"]) < 1e-6, u
        for metric in ("ace", "ece", "eqace", "gace", "gece"):
            assert abs(repo_out["mean"][u]["metrics"][metric]
                       - ref_out["mean"][u]["metrics"][metric]) < 1e-7, (u, metric)


def test_cross_stack_shape_stats(ref, repo_tree):
    version = _ref_version(ref, repo_tree["base"])
    dl = ref.dataloader.ExperimentDataloader(version, "id")
    split_dir = repo_tree["exp_path"] / "id"
    ref.shape.compute_prediction_shape_stats(dl)
    ref_out = json.loads((split_dir / "area.json").read_text())
    (split_dir / "area.json").unlink()
    repo_out = repo_shape_stats(ResultsReader(split_dir))
    assert repo_out.keys() == ref_out.keys()
    for iid in repo_out:
        assert abs(repo_out[iid]["area"] - ref_out[iid]["area"]) < 1e-9
        assert abs(repo_out[iid]["border"] - ref_out[iid]["border"]) < 1e-9
