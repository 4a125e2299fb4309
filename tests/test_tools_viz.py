"""Tests for tools (completeness checks), visualization, sliding window."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
from PIL import Image

from diffuncertainty_tpu.evaln.visualization import (
    barplot,
    collect_results,
    task_table,
    to_latex,
)
from diffuncertainty_tpu.infer.sliding_window import sliding_window_predict
from diffuncertainty_tpu.tools.checks import (
    backfill_tu,
    check_eval_matrix,
    check_test_finished,
    keep_largest_epoch_checkpoint,
    merge_metric_logs,
)


def _fake_split_dir(tmp_path, name="split", ids=("a", "b"), heatmaps=("TU", "AU", "EU")):
    d = tmp_path / name
    (d / "pred_seg").mkdir(parents=True)
    metrics = {}
    for i in ids:
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(d / "pred_seg" / f"{i}_01.png")
        metrics[i] = {"dataset": "toy", "metrics": {"dice": 0.8, "ged": 0.1}}
        for u in heatmaps:
            (d / u).mkdir(exist_ok=True)
            Image.fromarray(np.ones((4, 4), np.float32) * 0.5, mode="F").save(d / u / f"{i}.tif")
    (d / "metrics.json").write_text(json.dumps(metrics))
    (d / "failure_detection.json").write_text(json.dumps(
        {"mean": {"TU": {"image_level": {"metrics": {"aurc": 0.2, "eaurc": 0.1}}}}}
    ))
    return d


def test_check_test_finished(tmp_path):
    d = _fake_split_dir(tmp_path)
    assert check_test_finished(d)["status"] == "finished"
    (d / "TU" / "a.tif").unlink()
    res = check_test_finished(d)
    assert res["status"] == "partial" and any("TU" in p for p in res["problems"])
    assert check_test_finished(tmp_path / "nope")["status"] == "missing"


def test_check_eval_matrix(tmp_path):
    d = _fake_split_dir(tmp_path)
    m = check_eval_matrix({"v0": d})
    assert m["v0"]["failure_detection"] == "done"
    assert m["v0"]["calibration"] == "missing"


def test_keep_largest_epoch(tmp_path):
    root = tmp_path / "ckpts"
    for e in (2, 4, 8):
        (root / f"epoch_{e:06d}").mkdir(parents=True)
    (root / "last").mkdir()
    removed = keep_largest_epoch_checkpoint(root)
    assert len(removed) == 2
    left = sorted(p.name for p in root.iterdir())
    assert left == ["epoch_000008", "last"]


def test_backfill_tu(tmp_path):
    d = _fake_split_dir(tmp_path, heatmaps=("AU", "EU"))
    n = backfill_tu(d)
    assert n == 2
    tu = np.asarray(Image.open(d / "TU" / "a.tif"))
    np.testing.assert_allclose(tu, 1.0)  # 0.5 + 0.5


def test_merge_metric_logs(tmp_path):
    w1 = tmp_path / "run1"
    w2 = tmp_path / "run2"
    w1.mkdir(); w2.mkdir()
    (w1 / "metrics.jsonl").write_text(
        '{"epoch": 0, "train_loss": 1.0}\n{"epoch": 1, "train_loss": 0.9}\n'
    )
    (w2 / "metrics.jsonl").write_text(
        '{"epoch": 1, "train_loss": 0.85}\n{"epoch": 2, "train_loss": 0.8}\n'
    )
    n = merge_metric_logs([w1, w2], tmp_path / "merged.jsonl")
    assert n == 3
    recs = [json.loads(l) for l in (tmp_path / "merged.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in recs] == [0, 1, 2]
    assert recs[1]["train_loss"] == 0.85  # resumed run wins


def test_collect_results_and_table(tmp_path):
    d1 = _fake_split_dir(tmp_path, "v_s1")
    d2 = _fake_split_dir(tmp_path, "v_s2")
    df = collect_results({"v_s1": d1, "v_s2": d2})
    assert {"failure_detection", "segmentation"} <= set(df["task"])
    table = task_table(df, group_seeds=True)
    assert ("mean", "v") in table.columns
    latex = to_latex(table)
    assert r"\begin{tabular}" in latex and "aurc" in latex

    out = barplot(df, metric="aurc", task="failure_detection", out_path=tmp_path / "bar.png")
    assert out.exists()


def test_ood_shift_panel(tmp_path):
    from diffuncertainty_tpu.evaln.visualization import ood_shift_panel

    dirs = {}
    for method in ("dropout", "swag"):
        for shift in ("id", "ood_noise", "ood_blur"):
            dirs[f"{method}/{shift}"] = _fake_split_dir(
                tmp_path, f"{method}_{shift}")
    df = collect_results(dirs)
    out = ood_shift_panel(df, tmp_path / "shift.png", metric="aurc",
                          task="failure_detection")
    assert out.exists()
    with pytest.raises(ValueError):
        ood_shift_panel(df, tmp_path / "x.png", metric="nope")


def test_al_improvement_plot(tmp_path):
    from diffuncertainty_tpu.evaln.visualization import al_improvement_plot

    out = al_improvement_plot(
        {"dropout": {"first": 0.80, "unc": 0.86, "random": 0.83, "best": 0.88},
         "swag": {"first": 0.79, "unc": 0.85, "random": 0.82}},
        tmp_path / "al.png")
    assert out.exists()


def test_risk_coverage_plot(tmp_path):
    from diffuncertainty_tpu.evaln.visualization import risk_coverage_plot

    rng = np.random.default_rng(1)
    risks = rng.uniform(0, 1, 500)
    good = 1.0 - risks + rng.normal(0, 0.1, 500)  # informative confidence
    bad = rng.uniform(0, 1, 500)  # uninformative
    out = risk_coverage_plot(
        {"TU": (risks, good), "random": (risks, bad)}, tmp_path / "rc.png")
    assert out.exists()


def test_reliability_diagram(tmp_path):
    from diffuncertainty_tpu.evaln.visualization import reliability_diagram

    rng = np.random.default_rng(0)
    confids = rng.uniform(0.3, 1.0, 4000)
    correct = (rng.uniform(size=4000) < confids).astype(np.int64)  # calibrated
    out = reliability_diagram(correct, confids, tmp_path / "rel.png")
    assert out.exists()


def test_sliding_window_identity_for_full_window():
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 3)), jnp.float32)
    fn = lambda t: t * 2.0
    out = sliding_window_predict(fn, x, window=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2, atol=1e-6)


def test_sliding_window_constant_field_exact():
    x = jnp.ones((1, 20, 20, 1))
    fn = lambda t: t * 3.0
    out = sliding_window_predict(fn, x, window=8, stride=4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_sliding_window_jits_and_matches_pointwise_model():
    x = jnp.asarray(np.random.default_rng(1).random((1, 24, 24, 2)), jnp.float32)
    fn = lambda t: jnp.tanh(t)  # pointwise -> stitching must be exact

    @jax.jit
    def run(x):
        return sliding_window_predict(fn, x, window=8, stride=5)

    np.testing.assert_allclose(np.asarray(run(x)), np.tanh(np.asarray(x)), atol=1e-5)


def test_raw_predictions_and_grid(tmp_path):
    from diffuncertainty_tpu.core.config import load_config
    from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.evaln.visualization import plot_prediction_grid
    from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
    from diffuncertainty_tpu.train import Trainer

    toy = generate_toy_dataset(tmp_path / "toy", num_train=8, num_val=2, num_test=4,
                               num_ood=2, size=32, seed=0)
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="dropout",
        overrides=["network.model_channels=8", "network.num_res_blocks=[1,1]",
                   "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]",
                   f"save_dir={tmp_path}", f"data.data_input_dir={toy}",
                   "data.split_name=default", "trainer.max_epochs=1",
                   "data.batch_size=4"],
    )
    trainer = Trainer(cfg)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy, split="train", return_all_raters=False)
    trainer.fit(BatchLoader(train_ds, 4, shuffle=True, drop_last=True), None)
    inf = UncertaintyInference(
        [trainer.workdir / "checkpoints" / "last"],
        InferenceConfig(n_pred=1, n_models=3, batch_size=2, save_dir=str(tmp_path / "r")),
    )
    raw = inf.collect_raw_predictions("id", num_images=2)
    assert len(raw["records"]) == 2
    rec = raw["records"][0]
    assert rec["groups"].shape[0] == 3 and rec["mean"].shape == (32, 32, 2)
    out = plot_prediction_grid(raw, tmp_path / "grid.png")
    assert out.exists()


def test_metric_matrix_and_scatter(tmp_path):
    import pandas as pd

    from diffuncertainty_tpu.evaln.visualization import au_eu_scatter, metric_matrix

    rows = []
    for version in ("m1", "m2"):
        for unc in ("TU", "AU", "EU"):
            for agg in ("image_level", "patch_level"):
                rows.append(dict(task="ood_detection", metric="auroc", unc_type=unc,
                                 aggregation=agg, version=version,
                                 value=0.6 + 0.1 * (unc == "EU") + 0.05 * (version == "m2"),
                                 dataset="-"))
    df = pd.DataFrame(rows)
    pivot = metric_matrix(df, task="ood_detection", metric="auroc",
                          out_path=tmp_path / "mm.png")
    assert pivot.shape == (3, 2) and (tmp_path / "mm.png").exists()
    out = au_eu_scatter(df, out_path=tmp_path / "scatter.png")
    assert out.exists()


def test_grid_compositions(tmp_path):
    """metric_matrix_grid / scatter_grid (the reference's plot_mm_grid /
    plot_scatter_grid compositions) render mixed present/missing cells."""
    import pandas as pd

    from diffuncertainty_tpu.evaln.visualization import (
        metric_matrix_grid,
        scatter_grid,
    )

    rows = []
    for version in ("m1", "m2"):
        for unc in ("TU", "AU", "EU"):
            for agg in ("image_level", "patch_level"):
                rows.append(dict(task="ood_detection", metric="auroc",
                                 unc_type=unc, aggregation=agg, version=version,
                                 value=0.6 + 0.1 * (unc == "EU"), dataset="-"))
                rows.append(dict(task="failure_detection", metric="aurc",
                                 unc_type=unc, aggregation=agg, version=version,
                                 value=0.2, dataset="-"))
    df = pd.DataFrame(rows)

    out = metric_matrix_grid(
        df,
        cells=[("ood_detection", "auroc"), ("failure_detection", "aurc"),
               ("calibration", "ace")],  # last cell has no rows -> empty axis
        out_path=tmp_path / "mm_grid.png",
    )
    assert out.exists()

    out = scatter_grid(
        df,
        cells=[("ood_detection", "auroc", "image_level"),
               ("failure_detection", "aurc", "patch_level"),
               ("calibration", "ace", "image_level")],  # missing -> empty axis
        out_path=tmp_path / "scatter_grid.png",
    )
    assert out.exists()


def test_rank_table_direction_aware():
    """rank_table ranks higher-is-better and lower-is-better rows in the
    right direction (1 = best) and appends a mean_rank summary row."""
    import pandas as pd

    from diffuncertainty_tpu.evaln.visualization import rank_table, task_table

    rows = []
    for version, auroc, aurc in (("good_s0", 0.9, 0.1), ("bad_s0", 0.6, 0.4)):
        rows.append(dict(task="ood_detection", metric="auroc", unc_type="EU",
                         aggregation="image_level", version=version,
                         value=auroc, dataset="-"))
        rows.append(dict(task="failure_detection", metric="aurc", unc_type="TU",
                         aggregation="image_level", version=version,
                         value=aurc, dataset="-"))
    table = task_table(pd.DataFrame(rows), group_seeds=True)
    ranks = rank_table(table)

    body = ranks.iloc[:-1]
    # 'good' wins both rows: higher auroc AND lower aurc both rank 1
    assert (body["good"] == 1.0).all() and (body["bad"] == 2.0).all()
    summary = ranks.iloc[-1]
    assert summary["good"] == 1.0 and summary["bad"] == 2.0


def test_entangle_metric():
    import numpy as np

    from diffuncertainty_tpu.evaln.visualization import entangle_metric

    # perfectly entangled pair -> 0; axis-dominant pairs -> ±1
    assert entangle_metric(0.7, 0.7) == pytest.approx(0.0)
    assert entangle_metric(1.0, 0.0) == pytest.approx(1.0)
    assert entangle_metric(0.0, 1.0) == pytest.approx(-1.0)
    # lower_is_better flips the sign; arrays broadcast
    assert entangle_metric(1.0, 0.0, lower_is_better=True) == pytest.approx(-1.0)
    arr = entangle_metric(np.array([0.5, 0.0]), np.array([0.5, 1.0]))
    assert arr == pytest.approx([0.0, -1.0])


# ---- logger backends + training-curve figures ------------------------------

def test_metric_logger_tensorboard_roundtrip(tmp_path):
    from diffuncertainty_tpu.utils.loggers import MetricLogger
    from diffuncertainty_tpu.evaln.visualization import (
        load_tfevents_curves,
        load_training_curves,
        merge_training_curves,
        plot_training_curves,
    )

    for seed in (1, 2):
        lg = MetricLogger(tmp_path / f"run_s{seed}", ("jsonl", "tensorboard"), echo=False)
        for step in range(5):
            lg.log({"step": step, "train_loss": 1.0 / (step + seed),
                    "note": "text-skipped-by-tb"})
        lg.close()

    # JSONL canonical stream
    df = load_training_curves(tmp_path / "run_s1")
    assert set(df["key"]) == {"train_loss"} and len(df) == 5

    # TB mirror readable through the tfevents loader
    tb = load_tfevents_curves(tmp_path / "run_s1" / "tb")
    assert set(tb["key"]) == {"train_loss"} and len(tb) == 5
    import numpy as np
    np.testing.assert_allclose(
        sorted(tb["value"]), sorted(df["value"]), rtol=1e-6
    )

    merged = merge_training_curves({
        "exp_s1": tmp_path / "run_s1", "exp_s2": tmp_path / "run_s2"})
    assert set(merged["run"]) == {"exp_s1", "exp_s2"}
    out = plot_training_curves(merged, ["train_loss"], tmp_path / "curves.png")
    assert out.exists() and out.stat().st_size > 0


def test_uncertainty_panel(tmp_path, rng):
    from diffuncertainty_tpu.evaln.visualization import uncertainty_panel

    g, s, hw, c = 3, 2, 16, 2
    records = []
    for i in range(2):
        groups = rng.random((g, s, hw, hw, c)).astype("float32")
        groups /= groups.sum(-1, keepdims=True)
        records.append({
            "image_id": f"im{i}",
            "image": rng.random((hw, hw, 3)).astype("float32"),
            "gt": (rng.random((4, hw, hw)) > 0.5).astype("int32"),
            "groups": groups,
            "mean": groups.mean((0, 1)),
        })
    out = uncertainty_panel({"records": records}, tmp_path / "panel.png")
    assert out.exists() and out.stat().st_size > 0


def test_plot_tta_augs(tmp_path, rng):
    from diffuncertainty_tpu.evaln.visualization import plot_tta_augs

    img = rng.random((32, 32)).astype("float32")
    out = plot_tta_augs(img, tmp_path / "tta.png", n=4)
    assert out.exists() and out.stat().st_size > 0


def test_bench_weights_npz_roundtrip(tmp_path, rng):
    from diffuncertainty_tpu.tools.bench_weights import load_params_npz, save_params_npz

    tree = {
        "params": {
            "conv": {"kernel": rng.random((3, 3, 2, 4)).astype("float32"),
                     "bias": rng.random((4,)).astype("float32")},
            "norm": {"scale": rng.random((4,)).astype("float32")},
        }
    }
    path = save_params_npz(tree, tmp_path / "w.npz")
    back = load_params_npz(path)
    import jax
    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_to_latex_highlight_best_is_direction_aware():
    """Weak-spot hardening: the bolded winner must follow metric direction
    (lower-is-better for risk metrics, higher for dice), cell by cell."""
    import pandas as pd

    from diffuncertainty_tpu.evaln.visualization import task_table

    rows = []
    for version, aurc, dice in [("m1_s1", 0.10, 0.80), ("m2_s1", 0.05, 0.90),
                                ("m3_s1", 0.20, 0.95)]:
        rows.append(dict(task="failure_detection", unc_type="TU",
                         aggregation="image_level", metric="aurc",
                         value=aurc, dataset="-", version=version))
        rows.append(dict(task="segmentation", unc_type="-", aggregation="-",
                         metric="dice", value=dice, dataset="-", version=version))
    table = task_table(pd.DataFrame(rows), group_seeds=True)
    latex = to_latex(table)
    aurc_line = next(l for l in latex.splitlines() if "aurc" in l)
    dice_line = next(l for l in latex.splitlines() if "dice" in l)
    # aurc: LOWEST value (m2's 0.05) bolded; dice: HIGHEST (m3's 0.95)
    assert r"\textbf{0.0500}" in aurc_line and r"\textbf" not in aurc_line.replace(
        r"\textbf{0.0500}", "")
    assert r"\textbf{0.9500}" in dice_line and r"\textbf" not in dice_line.replace(
        r"\textbf{0.9500}", "")


def test_collect_results_flattening_content(tmp_path):
    """Weak-spot hardening: the tidy rows must carry the exact numbers from
    the task JSONs — drift in metric names or nesting would previously
    survive the structure-only assertions."""
    d = tmp_path / "v0"
    d.mkdir()
    (d / "failure_detection.json").write_text(json.dumps({
        "mean": {"TU": {"image_level": {"metrics": {"aurc": 0.123, "eaurc": 0.045}}},
                 "EU": {"image_level": {"metrics": {"aurc": 0.3, "eaurc": 0.2}}}},
    }))
    (d / "ood_detection.json").write_text(json.dumps({
        "id&ood_blur": {"mean": {"TU": {"image_level": {
            "metrics": {"auroc": 0.91, "detection_rate": 0.5}}}}},
    }))
    (d / "metrics.json").write_text(json.dumps({
        "im1": {"dataset": "toy", "metrics": {"dice": 0.8}},
        "im2": {"dataset": "toy", "metrics": {"dice": 0.6}},
    }))
    df = collect_results({"v0": d})
    rec = df.set_index(["task", "unc_type", "metric"])["value"]
    assert rec[("failure_detection", "TU", "aurc")] == 0.123
    assert rec[("failure_detection", "EU", "eaurc")] == 0.2
    assert rec[("ood_detection", "TU", "auroc")] == 0.91
    ood_row = df[(df.task == "ood_detection") & (df.metric == "auroc")].iloc[0]
    assert ood_row["dataset"] == "id&ood_blur"
    assert rec[("segmentation", "-", "dice")] == pytest.approx(0.7)


def test_dataset_overview_panel(tmp_path):
    """LIDC-style dataset overview figure on the toy contract tree
    (reference plot_lidc, visualization/helpers.py:1917)."""
    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.evaln.visualization import dataset_overview_panel

    toy = generate_toy_dataset(tmp_path / "toy", num_train=10, num_val=3,
                               num_test=4, num_ood=3, size=24, seed=3)
    out = dataset_overview_panel(toy, tmp_path / "overview.png",
                                 n_rows=2, seed=1)
    assert out.exists() and out.stat().st_size > 2000


def test_grouped_rows_panel(tmp_path):
    """Chaksu-style scanner-rows figure: synthetic metadata.csv grouping
    over the toy tree (reference plot_chaksu, visualization/helpers.py:2307)."""
    import csv

    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.evaln.visualization import grouped_rows_panel

    toy = generate_toy_dataset(tmp_path / "toy2", num_train=9, num_val=2,
                               num_test=2, num_ood=2, size=24, seed=4)
    scanners = ["Remidio", "Bosch", "Forus"]
    with open(toy / "preprocessed" / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image_file", "machine"])
        w.writeheader()
        for i in range(9):
            w.writerow({"image_file": f"images/train_{i:04d}.npy",
                        "machine": scanners[i % 3]})
    out = grouped_rows_panel(
        toy, tmp_path / "rows.png", group_col="machine", groups=scanners,
        group_titles=["Remidio\n(id)", "Bosch\n(ood)", "Forus\n(ood)"],
        n_cols=3, label_cols=2,
    )
    assert out.exists() and out.stat().st_size > 2000


def test_model_comparison_panel(tmp_path):
    """Models x images qualitative figure (reference qualitative_plot_models/
    qualitative_plot_uncertainty, visualization/helpers.py:2521-3410)."""
    from diffuncertainty_tpu.core.config import load_config
    from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.evaln.visualization import model_comparison_panel
    from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
    from diffuncertainty_tpu.train import Trainer

    toy = generate_toy_dataset(tmp_path / "toy", num_train=8, num_val=2,
                               num_test=4, num_ood=2, size=32, seed=0)
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="dropout",
        overrides=["network.model_channels=8", "network.num_res_blocks=[1,1]",
                   "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]",
                   f"save_dir={tmp_path}", f"data.data_input_dir={toy}",
                   "data.split_name=default", "trainer.max_epochs=1",
                   "data.batch_size=4"],
    )
    trainer = Trainer(cfg)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy, split="train", return_all_raters=False)
    trainer.fit(BatchLoader(train_ds, 4, shuffle=True, drop_last=True), None)
    ckpt = trainer.workdir / "checkpoints" / "last"
    raws = {}
    for label, n_models in [("dropout3", 3), ("dropout1", 1)]:
        inf = UncertaintyInference(
            [ckpt], InferenceConfig(n_pred=1, n_models=n_models, batch_size=2,
                                    seed=4, save_dir=str(tmp_path / label)))
        raws[label] = inf.collect_raw_predictions("id", num_images=2)
    out = model_comparison_panel(raws, tmp_path / "cmp.png", n_images=2)
    assert out.exists() and out.stat().st_size > 2000

    # AU/EU/TU triptych over the same raw records (reference
    # qualitative_plot_uncertainty layout, helpers.py:2966-3410)
    from diffuncertainty_tpu.evaln.visualization import uncertainty_triptych_panel

    out3 = uncertainty_triptych_panel(raws, tmp_path / "tri.png", n_images=2)
    assert out3.exists() and out3.stat().st_size > 2000
