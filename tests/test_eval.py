"""Evaluation-stack tests over real inference outputs on toy data."""

import json

import numpy as np
import pytest

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
from diffuncertainty_tpu.data.toy import generate_toy_dataset
from diffuncertainty_tpu.evaln import (
    EvalRunner,
    ResultsReader,
    aggregate_uncertainties,
    patch_level_aggregation,
    threshold_aggregation,
)
from diffuncertainty_tpu.evaln.al_splits import generate_second_cycle_splits
from diffuncertainty_tpu.evaln.runner import run_ood_detection
from diffuncertainty_tpu.evaln.tasks import compute_ncc
from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
from diffuncertainty_tpu.train import Trainer

SMALL_NET = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
    "trainer.learning_rate=0.003",
    "trainer.max_epochs=3",
    "data.batch_size=8",
]


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Train + infer once; eval tests share the results tree."""
    tmp = tmp_path_factory.mktemp("eval_pipe")
    toy = generate_toy_dataset(tmp / "toy", num_train=16, num_val=6, num_test=8,
                               num_ood=6, size=32, seed=0)
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="dropout",
        overrides=SMALL_NET + [f"save_dir={tmp}", f"data.data_input_dir={toy}",
                               "data.split_name=default"],
    )
    trainer = Trainer(cfg)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy, split="train", return_all_raters=False)
    trainer.fit(BatchLoader(train_ds, 8, shuffle=True, drop_last=True), None)
    icfg = InferenceConfig(n_pred=1, n_models=4, batch_size=4,
                           save_dir=str(tmp / "results"))
    inf = UncertaintyInference([trainer.workdir / "checkpoints" / "last"], icfg)
    for split in ("id", "ood_noise", "val", "unlabeled_stub"):
        if split == "unlabeled_stub":
            continue
        inf.run_split(split)
    return {
        "toy": toy, "splits": splits, "inf": inf, "tmp": tmp,
        "id_dir": inf.split_dir("id"), "ood_dir": inf.split_dir("ood_noise"),
        "val_dir": inf.split_dir("val"),
    }


def _dataset(p, split):
    return MultiRaterDataset(p["splits"], p["toy"], split=split)


def test_aggregation_writes_all_files(pipeline):
    runner = EvalRunner(pipeline["id_dir"], _dataset(pipeline, "id"), ignore_value=-1)
    summary = runner.run(["threshold", "area", "aggregation"])
    assert all(v == "done" for v in summary.values())
    d = pipeline["id_dir"]
    assert (d / "area.json").exists()
    assert (d.parent / "threshold_analysis.json").exists()
    agg = json.loads((d / "aggregated_TU.json").read_text())
    assert len(agg) == 8
    rec = next(iter(agg.values()))
    for k in ("image_level", "patch_level", "threshold", "area_normalized",
              "border_normalized"):
        assert k in rec and np.isfinite(rec[k]["max_score"])


def test_failure_detection_task(pipeline):
    runner = EvalRunner(pipeline["id_dir"], _dataset(pipeline, "id"), ignore_value=-1)
    runner.run(["threshold", "area", "aggregation"])
    out = runner.run(["failure_detection"])
    fd = json.loads((pipeline["id_dir"] / "failure_detection.json").read_text())
    rec = fd["mean"]["TU"]["image_level"]["metrics"]
    assert np.isfinite(rec["aurc"]) and np.isfinite(rec["eaurc"])


def test_ood_detection_paired(pipeline):
    for d, split in ((pipeline["id_dir"], "id"), (pipeline["ood_dir"], "ood_noise")):
        EvalRunner(d, _dataset(pipeline, split), ignore_value=-1).run(
            ["threshold", "area", "aggregation"]
        )
    res = run_ood_detection(pipeline["id_dir"], pipeline["ood_dir"])
    key = next(iter(res))
    auroc = res[key]["mean"]["TU"]["image_level"]["metrics"]["auroc"]
    assert 0.0 <= auroc <= 1.0
    # ood_noise corrupts inputs heavily; uncertainty should rank it above id
    assert auroc > 0.5, f"expected OoD AUROC > 0.5, got {auroc}"


def test_calibration_task(pipeline):
    for d, split in ((pipeline["id_dir"], "id"), (pipeline["val_dir"], "val")):
        EvalRunner(d, _dataset(pipeline, split), ignore_value=-1).run(
            ["threshold", "area", "aggregation"]
        )
    runner = EvalRunner(
        pipeline["id_dir"], _dataset(pipeline, "id"),
        val_split_dir=pipeline["val_dir"], val_dataset=_dataset(pipeline, "val"),
        ignore_value=-1,
    )
    runner.run(["calibration"])
    calib = json.loads((pipeline["id_dir"] / "calibration.json").read_text())
    rec = calib["mean"]["TU"]["metrics"]
    for k in ("ace", "ece", "eqace", "gace", "gece"):
        assert 0.0 <= rec[k] <= 1.0
    # platt params cached for reuse
    assert (pipeline["id_dir"].parent / "platt_scale_params.json").exists()


def test_ambiguity_modeling_task(pipeline):
    runner = EvalRunner(pipeline["id_dir"], _dataset(pipeline, "id"), ignore_value=-1)
    runner.run(["ambiguity_modeling"])
    amb = json.loads((pipeline["id_dir"] / "ambiguity_modeling.json").read_text())
    assert -1.0 <= amb["mean"]["TU"]["metrics"]["ncc"] <= 1.0


def test_skip_finished(pipeline):
    runner = EvalRunner(pipeline["id_dir"], _dataset(pipeline, "id"), ignore_value=-1)
    runner.run(["area"])
    summary = runner.run(["area"])
    assert summary["area"] == "skipped (finished)"


def test_ncc_golden():
    rng = np.random.default_rng(0)
    a = rng.random((16, 16))
    # reference quirk: ddof=1 std but /N normalization -> NCC(a,a) = (N-1)/N
    n = a.size
    assert compute_ncc(a, a) == pytest.approx((n - 1) / n, abs=1e-6)
    assert compute_ncc(a, -a) == pytest.approx(-(n - 1) / n, abs=1e-6)
    assert compute_ncc(a, np.zeros_like(a)) == 0.0


def test_patch_and_threshold_aggregation_golden():
    img = np.zeros((8, 8), np.float32)
    img[2:4, 2:4] = 1.0
    out = patch_level_aggregation(img, patch_size=2)
    assert out["max_score"] == 4.0
    assert out["bounding_box"] == [(2, 4), (2, 4)]
    thr = threshold_aggregation(img, threshold=0.5)
    assert thr["max_score"] == 1.0  # mean of selected values


def test_al_second_cycle_splits(pipeline):
    # use ood_noise's aggregated TU as the "unlabeled pool" scores
    EvalRunner(pipeline["ood_dir"], _dataset(pipeline, "ood_noise"), ignore_value=-1).run(
        ["threshold", "area", "aggregation"]
    )
    out_splits = pipeline["tmp"] / "second_cycle_splits.pkl"
    queried = generate_second_cycle_splits(
        pipeline["splits"],
        pipeline["ood_dir"] / "aggregated_TU.json",
        out_splits,
        pool_split="ood_noise",
        strategy="uncertainty",
    )
    assert len(queried) == 3  # ceil(6 * 0.5)
    from diffuncertainty_tpu.data.dataset import load_splits

    new_fold = load_splits(out_splits)[0]
    assert len(new_fold["train"]) == 16 + 3
    assert len(new_fold["ood_noise"]) == 3
    # random control
    q2 = generate_second_cycle_splits(
        pipeline["splits"], pipeline["ood_dir"] / "aggregated_TU.json",
        pipeline["tmp"] / "rand_splits.pkl", pool_split="ood_noise",
        strategy="random", seed=1,
    )
    assert len(q2) == 3
