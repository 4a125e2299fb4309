"""Version-matrix orchestration tests (reference ``eval_experiments.py:25-465``).

Runs over a synthetic results tree (no training) so the matrix mechanics —
iter_params expansion, preflight classification, accumulated threshold,
per-version tasks, paired OoD, skip logic, cleanup — are pinned in isolation.
The full study (trained models through the matrix) lives in
``tests/test_values_study.py``.
"""

import dataclasses
import json

import numpy as np
import pytest
from PIL import Image

from diffuncertainty_tpu.evaln import (
    EvalMatrix,
    ExperimentVersion,
    ResultsReader,
    expand_versions,
    write_matrix_report,
)

SIZE = 16


def _fake_split(split_dir, image_ids, rng, *, ood: bool = False):
    """A minimal results split dir: pred_seg PNGs, TU/AU/EU TIFFs, metrics.json."""
    pred = split_dir / "pred_seg"
    pred.mkdir(parents=True, exist_ok=True)
    metrics = {}
    for iid in image_ids:
        mask = (rng.random((SIZE, SIZE)) > 0.6).astype(np.uint8) * 255
        for name in (f"{iid}_mean", f"{iid}_01", f"{iid}_02"):
            Image.fromarray(mask, mode="L").save(pred / f"{name}.png")
        for unc in ("TU", "AU", "EU"):
            d = split_dir / unc
            d.mkdir(exist_ok=True)
            base = rng.random((SIZE, SIZE)).astype(np.float32)
            if ood:
                base = base + 0.8  # ood heatmaps hotter -> AUROC ~ 1
            Image.fromarray(base, mode="F").save(d / f"{iid}.tif")
        metrics[iid] = {"dataset": "toy", "metrics": {"dice": float(rng.random())}}
    (split_dir / "metrics.json").write_text(json.dumps(metrics))


@pytest.fixture()
def matrix_tree(tmp_path):
    """2 pred_models x 2 seeds, each with id + ood_noise splits."""
    rng = np.random.default_rng(0)
    base = tmp_path / "results"
    experiments = [{
        "iter_params": {
            "pred_model": ["softmax_none", "ssn_none"],
            "seed": [0, 1],
        },
        "exp_name": "{pred_model}",
        "naming_scheme_version": "s{seed}/e3",
        "n_pred": 4,
    }]
    versions = expand_versions(base, experiments)
    for v in versions:
        for split, ood in (("id", False), ("ood_noise", True)):
            _fake_split(v.exp_path / split, [f"img{i}" for i in range(6)], rng, ood=ood)
    return base, experiments, versions


def test_expand_versions_product_and_overrides(tmp_path):
    experiments = [{
        "iter_params": {"pred_model": ["a", "b"], "seed": [0, 1, 2]},
        "naming_scheme_version": "s{seed}",
        "n_pred": 8,
        "prediction_models": {"b": {"only_pu": True, "epoch": 9}},
    }]
    versions = expand_versions(tmp_path, experiments)
    assert len(versions) == 6
    labels = {v.label() for v in versions}
    assert "a/s0" in labels and "b/s2" in labels
    a0 = next(v for v in versions if v.pred_model == "a" and v.params["seed"] == 0)
    b0 = next(v for v in versions if v.pred_model == "b" and v.params["seed"] == 0)
    assert a0.unc_types == ("TU", "AU", "EU")
    assert b0.unc_types == ("TU",)  # only_pu override
    assert b0.params["epoch"] == 9
    assert a0.exp_path == tmp_path / "a" / "test_results8" / "s0"
    # nested version names (version/epoch) resolve as subpaths
    nested = ExperimentVersion(
        base_path=tmp_path, pred_model="m",
        naming_scheme_version="s{seed}/e{epoch}", params={"seed": 1, "epoch": 40},
    )
    assert nested.exp_path == tmp_path / "m" / "test_results" / "s1" / "e40"


def test_preflight_classification(matrix_tree, tmp_path):
    base, experiments, versions = matrix_tree
    # one extra version with no results on disk -> missing
    ghost = expand_versions(base, [{
        "iter_params": {"pred_model": ["ghost"], "seed": [0]},
        "naming_scheme_version": "s{seed}/e3", "n_pred": 4,
    }])
    matrix = EvalMatrix(versions + ghost, paired_splits=[("id", "ood_noise")])
    statuses = matrix.classify(["threshold", "area", "aggregation"])
    assert len(statuses) == 5
    missing = [k for k, s in statuses.items() if s["missing"]]
    assert missing == [ghost[0].exp_path.as_posix()]
    # nothing evaluated yet -> nothing finished
    assert not any(s["finished"] for s in statuses.values())
    summary = matrix.status_summary()
    assert "Missing: 1" in summary and "Finished: 0" in summary
    report = write_matrix_report(matrix, tmp_path / "report.json")
    assert len(report["versions"]) == 5


def test_matrix_runs_tasks_and_finishes(matrix_tree):
    base, experiments, versions = matrix_tree
    matrix = EvalMatrix(versions, paired_splits=[("id", "ood_noise")])
    tasks = ["threshold", "area", "aggregation", "ood_detection", "failure_detection"]
    summary = matrix.run(tasks)
    assert all(v == "done" for v in summary.values())
    for v in versions:
        # accumulated threshold: per-version analysis files at exp_path
        assert (v.exp_path / "quantile_analysis.json").is_file()
        thresh = json.loads((v.exp_path / "threshold_analysis.json").read_text())
        assert v.pred_model in thresh
        # per-split outputs
        for split in ("id", "ood_noise"):
            d = v.exp_path / split
            assert (d / "area.json").is_file()
            for unc in ("TU", "AU", "EU"):
                assert (d / f"aggregated_{unc}.json").is_file()
            assert (d / "failure_detection.json").is_file()
        ood = json.loads((v.exp_path / "ood_detection.json").read_text())
        auroc = ood["id&ood_noise"]["mean"]["TU"]["image_level"]["metrics"]["auroc"]
        assert auroc > 0.9  # ood heatmaps were built hotter
    # now the preflight sees every version finished
    statuses = matrix.classify(tasks)
    assert all(s["finished"] for s in statuses.values())


def test_skip_finished_versions(matrix_tree):
    base, experiments, versions = matrix_tree
    matrix = EvalMatrix(versions, paired_splits=[("id", "ood_noise")])
    tasks = ["threshold", "area", "aggregation", "ood_detection", "failure_detection"]
    matrix.run(tasks)
    # re-run with skip_finished: outputs must not be rewritten
    skipping = [dataclasses.replace(v, skip_finished=True) for v in versions]
    mtimes = {
        v.exp_path / "threshold_analysis.json":
            (v.exp_path / "threshold_analysis.json").stat().st_mtime_ns
        for v in versions
    }
    EvalMatrix(skipping, paired_splits=[("id", "ood_noise")]).run(tasks)
    for path, mtime in mtimes.items():
        assert path.stat().st_mtime_ns == mtime
    # skip_missing skips versions with no results instead of crashing
    ghost = expand_versions(base, [{
        "iter_params": {"pred_model": ["ghost"], "seed": [0]},
        "naming_scheme_version": "s{seed}/e3", "n_pred": 4,
        "skip_missing": True,
    }])
    EvalMatrix(ghost).run(["area"])  # no output dirs -> skipped, no error


def test_cleanup_finished_removes_heatmaps(matrix_tree):
    base, experiments, versions = matrix_tree
    tasks = ["threshold", "area", "aggregation", "failure_detection", "cleanup_finished"]
    matrix = EvalMatrix(versions)
    # before the tasks ran, cleanup_finished must leave everything in place
    removed = matrix.cleanup(only_finished=True, tasks=tasks)
    assert removed == []
    matrix.run(tasks)  # cleanup_finished runs last in the chain
    for v in versions:
        for split in ("id", "ood_noise"):
            d = v.exp_path / split
            for sub in ("TU", "AU", "EU", "pred_seg"):
                assert not (d / sub).exists()
            # JSON artifacts survive
            assert (d / "area.json").is_file()
            assert (d / "metrics.json").is_file()


def test_unknown_task_rejected(matrix_tree):
    _, _, versions = matrix_tree
    with pytest.raises(ValueError, match="unknown eval tasks"):
        EvalMatrix(versions).run(["not_a_task"])


def test_cli_config_entry(matrix_tree, tmp_path, capsys):
    """YAML-config CLI: the reference's eval_experiments.py entry point."""
    import yaml

    base, experiments, versions = matrix_tree
    config = {
        "base_path": str(base),
        "experiments": [{
            "iter_params": {
                "pred_model": ["softmax_none", "ssn_none"],
                "seed": [0, 1],
            },
            "exp_name": "{pred_model}",
            "naming_scheme_version": "s{seed}/e3",
            "n_pred": 4,
        }],
        "tasks": ["threshold", "area", "aggregation", "ood_detection",
                  "failure_detection"],
        "paired_splits": [["id", "ood_noise"]],
    }
    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    from diffuncertainty_tpu.evaln.experiments import main as matrix_main

    # preflight only: prints the matrix, runs nothing
    matrix_main(["--config", str(cfg_path), "--preflight-only",
                 "--report", str(tmp_path / "report.json")])
    out = capsys.readouterr().out
    assert "Missing x Finished matrix" in out
    assert not (versions[0].exp_path / "quantile_analysis.json").exists()
    assert json.loads((tmp_path / "report.json").read_text())["versions"]

    summary = matrix_main(["--config", str(cfg_path)])
    assert summary["threshold"] == "done"
    for v in versions:
        assert (v.exp_path / "threshold_analysis.json").is_file()
        assert (v.exp_path / "ood_detection.json").is_file()
