"""Result tables and barplots (L7 reporting).

Reference: ``evaluation/visualization/ds_task_table.py:14-533`` (multi-index
pandas table over task x metric x pred_model x unc_type x aggregation,
grouped across seeds, color-coded LaTeX) and ``ds_task_barplots.py:14-300``.

Here a "version" is one evaluated results split dir; ``collect_results``
walks the task JSONs each version produced and builds the tidy DataFrame the
table/plot functions consume.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

_TASK_FILES = {
    "failure_detection": "failure_detection.json",
    "ood_detection": "ood_detection.json",
    "calibration": "calibration.json",
    "ambiguity_modeling": "ambiguity_modeling.json",
}


def _flatten_task(task: str, payload: dict) -> list[dict]:
    rows = []
    if task == "ood_detection":
        for dataset_key, body in payload.items():
            for unc, aggs in body.get("mean", {}).items():
                for agg, rec in aggs.items():
                    for metric, value in rec["metrics"].items():
                        rows.append(dict(task=task, unc_type=unc, aggregation=agg,
                                         metric=metric, value=value, dataset=dataset_key))
    elif task == "calibration" or task == "ambiguity_modeling":
        for unc, rec in payload.get("mean", {}).items():
            for metric, value in rec["metrics"].items():
                rows.append(dict(task=task, unc_type=unc, aggregation="-",
                                 metric=metric, value=value, dataset="-"))
    elif task == "failure_detection":
        for unc, aggs in payload.get("mean", {}).items():
            for agg, rec in aggs.items():
                for metric, value in rec["metrics"].items():
                    rows.append(dict(task=task, unc_type=unc, aggregation=agg,
                                     metric=metric, value=value, dataset="-"))
    return rows


def collect_results(
    versions: dict[str, str | Path],
    *,
    include_segmentation: bool = True,
) -> pd.DataFrame:
    """{version_name: split_dir} -> tidy DataFrame of all task metrics."""
    rows = []
    for version, split_dir in versions.items():
        split_dir = Path(split_dir)
        for task, fname in _TASK_FILES.items():
            path = split_dir / fname
            if not path.exists():
                continue
            for row in _flatten_task(task, json.loads(path.read_text())):
                row["version"] = version
                rows.append(row)
        if include_segmentation and (split_dir / "metrics.json").exists():
            metrics = json.loads((split_dir / "metrics.json").read_text())
            per_metric: dict[str, list[float]] = {}
            for rec in metrics.values():
                for metric, value in rec.get("metrics", {}).items():
                    per_metric.setdefault(metric, []).append(value)
            for metric, values in per_metric.items():
                rows.append(dict(task="segmentation", unc_type="-", aggregation="-",
                                 metric=metric, value=float(np.mean(values)),
                                 dataset="-", version=version))
    return pd.DataFrame(rows)


def task_table(
    df: pd.DataFrame,
    *,
    group_seeds: bool = True,
) -> pd.DataFrame:
    """Pivot to (task, metric, unc_type, aggregation) x version mean±std.

    With ``group_seeds``, versions named ``name_s{seed}`` collapse into
    ``name`` with mean and std columns (the reference's seed grouping).
    """
    df = df.copy()
    if group_seeds:
        df["group"] = df["version"].str.replace(r"_s\d+$", "", regex=True)
    else:
        df["group"] = df["version"]
    pivot = df.pivot_table(
        index=["task", "metric", "unc_type", "aggregation"],
        columns="group", values="value", aggfunc=["mean", "std"],
    )
    return pivot


# metrics where smaller is better (risk/error style); everything else is
# treated as higher-is-better when bolding the per-row winner
LOWER_IS_BETTER = {"aurc", "eaurc", "ace", "ece", "eqace", "gace", "gece", "ged", "ged_bma"}


def to_latex(table: pd.DataFrame, *, highlight_best: bool = True, precision: int = 4) -> str:
    """Compact LaTeX with the best mean per row bolded (direction-aware)."""
    means = table["mean"] if "mean" in table.columns.get_level_values(0) else table
    lines = [r"\begin{tabular}{l" + "c" * len(means.columns) + "}", r"\toprule"]
    lines.append(" & ".join(["metric"] + [str(c) for c in means.columns]) + r" \\")
    lines.append(r"\midrule")
    metric_pos = (
        list(means.index.names).index("metric") if "metric" in (means.index.names or []) else 1
    )
    for idx, row in means.iterrows():
        label = "/".join(str(x) for x in idx if x != "-")
        metric_name = str(idx[metric_pos]) if isinstance(idx, tuple) else str(idx)
        vals = row.values.astype(float)
        finite = np.isfinite(vals)
        if finite.any() and highlight_best:
            best = (
                np.nanargmin(vals)
                if metric_name.lower() in LOWER_IS_BETTER
                else np.nanargmax(vals)
            )
        else:
            best = -1
        cells = []
        for i, v in enumerate(vals):
            text = f"{v:.{precision}f}" if np.isfinite(v) else "-"
            cells.append(rf"\textbf{{{text}}}" if i == best else text)
        lines.append(" & ".join([label] + cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    return "\n".join(lines)


def barplot(
    df: pd.DataFrame,
    *,
    metric: str,
    task: str,
    out_path: str | Path,
    by: str = "unc_type",
):
    """Bar plot of one (task, metric) grouped along ``by`` x version."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = df[(df["task"] == task) & (df["metric"] == metric)]
    if sel.empty:
        raise ValueError(f"no rows for task={task} metric={metric}")
    pivot = sel.pivot_table(index=by, columns="version", values="value", aggfunc="mean")
    ax = pivot.plot.bar(figsize=(1.5 + 1.2 * len(pivot), 4), rot=0)
    ax.set_ylabel(metric)
    ax.set_title(f"{task}: {metric}")
    ax.figure.tight_layout()
    ax.figure.savefig(out_path, dpi=120)
    plt.close(ax.figure)
    return Path(out_path)


def metric_matrix(
    df: pd.DataFrame,
    *,
    task: str,
    metric: str,
    out_path: str | Path | None = None,
):
    """(unc_type x aggregation) heatmap of one task metric per version —
    the reference's metric-matrix panels (``visualization/helpers.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = df[(df["task"] == task) & (df["metric"] == metric)]
    if sel.empty:
        raise ValueError(f"no rows for {task}/{metric}")
    pivot = sel.pivot_table(index="unc_type", columns="aggregation",
                            values="value", aggfunc="mean")
    if out_path is not None:
        fig, ax = plt.subplots(figsize=(1.5 + 1.1 * pivot.shape[1], 1.2 + 0.6 * pivot.shape[0]))
        im = ax.imshow(pivot.values, cmap="viridis")
        ax.set_xticks(range(pivot.shape[1]), pivot.columns, rotation=30, ha="right")
        ax.set_yticks(range(pivot.shape[0]), pivot.index)
        for i in range(pivot.shape[0]):
            for j in range(pivot.shape[1]):
                ax.text(j, i, f"{pivot.values[i, j]:.3f}", ha="center", va="center",
                        color="white", fontsize=8)
        ax.set_title(f"{task}: {metric}")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    return pivot


def au_eu_scatter(
    df: pd.DataFrame,
    *,
    task: str = "ood_detection",
    metric: str = "auroc",
    aggregation: str = "image_level",
    out_path: str | Path = "au_eu_scatter.png",
):
    """AU-vs-EU score scatter per version (the "entanglement" figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = df[(df["task"] == task) & (df["metric"] == metric)
             & (df["aggregation"].isin([aggregation, "-"]))]
    pivot = sel.pivot_table(index="version", columns="unc_type",
                            values="value", aggfunc="mean")
    if "AU" not in pivot.columns or "EU" not in pivot.columns:
        raise ValueError("need both AU and EU rows for the scatter")
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(pivot["AU"], pivot["EU"])
    for version, row in pivot.iterrows():
        ax.annotate(str(version), (row["AU"], row["EU"]), fontsize=7,
                    xytext=(3, 3), textcoords="offset points")
    lims = [min(pivot["AU"].min(), pivot["EU"].min()) - 0.02,
            max(pivot["AU"].max(), pivot["EU"].max()) + 0.02]
    ax.plot(lims, lims, "k--", alpha=0.4)
    ax.set_xlabel(f"AU {metric}")
    ax.set_ylabel(f"EU {metric}")
    ax.set_title(f"{task} ({aggregation})")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def plot_prediction_grid(
    raw: dict,
    out_path: str | Path,
    *,
    max_samples: int = 6,
    heatmap: str = "TU",
):
    """Qualitative grid: image | raters | per-group samples | mean | heatmap.

    Consumes ``UncertaintyInference.collect_raw_predictions`` output — the
    reference's ``visualization/helpers.py`` ``plot_pred_grid`` equivalent.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.entropy import uncertainty_heatmaps
    import jax.numpy as jnp

    records = raw["records"]
    n_rows = len(records)
    sample_cols = min(max_samples, records[0]["groups"].shape[0])
    n_cols = 3 + sample_cols + 1  # image, gt-mean, samples..., mean, heatmap
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(2.2 * n_cols, 2.2 * n_rows))
    axes = np.atleast_2d(axes)
    for r, rec in enumerate(records):
        img = rec["image"]
        axes[r, 0].imshow(img if img.ndim == 2 else img[..., 0], cmap="gray")
        axes[r, 0].set_ylabel(str(rec["image_id"]), fontsize=7)
        axes[r, 1].imshow(rec["gt"].mean(axis=0), vmin=0, vmax=rec["gt"].max() or 1)
        for c in range(sample_cols):
            axes[r, 2 + c].imshow(np.argmax(rec["groups"][c, 0], axis=-1))
        axes[r, 2 + sample_cols].imshow(np.argmax(rec["mean"], axis=-1))
        group_means = rec["groups"].mean(axis=1)  # (G,H,W,C)
        maps = uncertainty_heatmaps(jnp.asarray(group_means), sample_axis=0, class_axis=-1)
        key = heatmap if heatmap in maps else list(maps)[0]
        axes[r, 3 + sample_cols].imshow(np.asarray(maps[key]), cmap="viridis")
        for ax in axes[r]:
            ax.set_xticks([]), ax.set_yticks([])
    titles = (["image", "raters"] + [f"s{c + 1}" for c in range(sample_cols)]
              + ["mean", heatmap])
    for c, t in enumerate(titles):
        axes[0, c].set_title(t, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


# --------------------------------------------------------------------------
# training curves: JSONL (canonical) + tfevents readers, seed-grouped plots
# (the reference's tfevents loading/merging in visualization/helpers.py and
# global_utils/merge_tfevents.py)
# --------------------------------------------------------------------------

def load_training_curves(workdir: str | Path) -> pd.DataFrame:
    """Read a run's ``metrics.jsonl`` into a long DataFrame
    (columns: step/epoch plus one row per scalar: key, value)."""
    records = []
    path = Path(workdir) / "metrics.jsonl"
    for i, line in enumerate(path.read_text().splitlines()):
        rec = json.loads(line)
        step = rec.get("step", rec.get("epoch", i))
        epoch = rec.get("epoch")
        for k, v in rec.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool) \
                    and k not in ("step", "epoch"):
                records.append({"step": step, "epoch": epoch, "key": k, "value": float(v)})
    return pd.DataFrame(records)


def load_tfevents_curves(logdir: str | Path) -> pd.DataFrame:
    """Read TensorBoard event files (e.g. the ``tb/`` dir MetricLogger
    writes, or reference runs) into the same long format."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(logdir))
    acc.Reload()
    records = []
    for tag in acc.Tags().get("scalars", []):
        for ev in acc.Scalars(tag):
            records.append({"step": ev.step, "epoch": None, "key": tag,
                            "value": float(ev.value)})
    return pd.DataFrame(records)


def merge_training_curves(runs: dict[str, str | Path]) -> pd.DataFrame:
    """Concatenate several runs' curves with a ``run`` column; reads JSONL
    when present, tfevents otherwise."""
    frames = []
    for name, workdir in runs.items():
        workdir = Path(workdir)
        if (workdir / "metrics.jsonl").exists():
            df = load_training_curves(workdir)
        else:
            df = load_tfevents_curves(workdir)
        df["run"] = name
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def plot_training_curves(
    curves: pd.DataFrame,
    keys: list[str],
    out_path: str | Path,
    *,
    group_seeds: bool = True,
):
    """Per-key training curves; runs named ``..._s{seed}`` are grouped into
    mean +/- std bands when ``group_seeds`` (the reference's seed-grouped
    loss panels)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import re

    if "run" not in curves.columns:
        curves = curves.assign(run="run")
    if group_seeds:
        curves = curves.assign(
            group=curves["run"].map(lambda r: re.sub(r"_s\d+$", "", str(r)))
        )
    else:
        curves = curves.assign(group=curves["run"])

    fig, axes = plt.subplots(1, len(keys), figsize=(4.5 * len(keys), 3.2), squeeze=False)
    for ax, key in zip(axes[0], keys):
        sel = curves[curves["key"] == key]
        if sel.empty:
            ax.set_title(f"{key} (no data)")
            continue
        for group, gdf in sel.groupby("group"):
            stats = gdf.groupby("step")["value"].agg(["mean", "std", "count"])
            ax.plot(stats.index, stats["mean"], label=str(group))
            if (stats["count"] > 1).any():
                sd = stats["std"].fillna(0.0)
                ax.fill_between(stats.index, stats["mean"] - sd, stats["mean"] + sd,
                                alpha=0.2)
        ax.set_title(key)
        ax.set_xlabel("step")
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def uncertainty_panel(
    raw: dict,
    out_path: str | Path,
    *,
    max_rows: int = 4,
):
    """Per-dataset paper panel: image | rater overlay | mean pred | TU | AU | EU
    (the reference's LIDC/Chaksu qualitative panels,
    ``visualization/helpers.py`` figure builders)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from ..ops.entropy import uncertainty_heatmaps

    records = raw["records"][:max_rows]
    cols = ["image", "raters", "mean pred", "TU", "AU", "EU"]
    fig, axes = plt.subplots(len(records), len(cols),
                             figsize=(2.2 * len(cols), 2.2 * len(records)))
    axes = np.atleast_2d(axes)
    for r, rec in enumerate(records):
        img = rec["image"]
        axes[r, 0].imshow(img if img.ndim == 2 else img[..., 0], cmap="gray")
        axes[r, 0].set_ylabel(str(rec["image_id"]), fontsize=7)
        axes[r, 1].imshow(rec["gt"].mean(axis=0), cmap="magma",
                          vmin=0, vmax=max(float(rec["gt"].max()), 1.0))
        axes[r, 2].imshow(np.argmax(rec["mean"], axis=-1))
        group_means = rec["groups"].mean(axis=1)
        maps = uncertainty_heatmaps(jnp.asarray(group_means), sample_axis=0, class_axis=-1)
        for c, key in enumerate(["TU", "AU", "EU"]):
            if key in maps:
                axes[r, 3 + c].imshow(np.asarray(maps[key]), cmap="viridis")
        for ax in axes[r]:
            ax.set_xticks([]), ax.set_yticks([])
    for c, t in enumerate(cols):
        axes[0, c].set_title(t, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def ood_shift_panel(
    df: "pd.DataFrame",
    out_path: str | Path,
    *,
    metric: str = "dice",
    task: str | None = None,
    shift_of=lambda v: v.rsplit("/", 1)[-1],
    method_of=lambda v: v.rsplit("/", 1)[0],
    id_shift: str = "id",
):
    """Metric-vs-distribution-shift degradation lines (the ValUES-style
    robustness figure: one line per method across id -> ood_noise/blur/...).

    ``df``: a :func:`collect_results` frame whose version names encode
    ``method/shift`` (override ``shift_of``/``method_of`` for other naming).
    The id split is pinned as the leftmost tick.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = df[df["metric"] == metric]
    if task is not None:
        sel = sel[sel["task"] == task]
    if sel.empty:
        raise ValueError(f"no rows for metric={metric!r} (task={task!r})")
    sel = sel.assign(shift=sel["version"].map(shift_of),
                     method=sel["version"].map(method_of))
    shifts = sorted(sel["shift"].unique(), key=lambda s: (s != id_shift, s))
    fig, ax = plt.subplots(figsize=(1.2 + 1.1 * len(shifts), 3.2))
    for method, rows in sel.groupby("method"):
        means = rows.groupby("shift")["value"].mean()
        ax.plot(range(len(shifts)), [means.get(s, np.nan) for s in shifts],
                marker="o", label=method)
    ax.set_xticks(range(len(shifts)))
    ax.set_xticklabels(shifts, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel(metric)
    ax.set_title(f"{metric} under distribution shift")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def al_improvement_plot(
    cycles: dict[str, dict[str, float]],
    out_path: str | Path,
    *,
    metric: str = "dice",
):
    """Active-learning panel: first-cycle score + per-query-strategy second
    cycle bars (uncertainty / random / best / worst controls), the figure
    behind ``tasks.al_improvement`` (reference
    ``evaluation/metrics/al_improvement.py``).

    ``cycles``: {method: {"first": v, "unc": v, "random": v, ...}}.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    strategies: list[str] = []
    for d in cycles.values():
        for k in d:
            if k != "first" and k not in strategies:
                strategies.append(k)
    x = np.arange(len(cycles))
    width = 0.8 / (len(strategies) + 1)
    fig, ax = plt.subplots(figsize=(1.6 + 1.4 * len(cycles), 3.2))
    ax.bar(x, [d["first"] for d in cycles.values()], width=width,
           label="first cycle", color="gray")
    for i, strat in enumerate(strategies):
        ax.bar(x + (i + 1) * width,
               [d.get(strat, np.nan) for d in cycles.values()],
               width=width, label=f"2nd: {strat}")
    ax.set_xticks(x + 0.4 - width / 2)
    ax.set_xticklabels(list(cycles), fontsize=8)
    ax.set_ylabel(metric)
    ax.set_title(f"active-learning second cycle ({metric})")
    ax.legend(fontsize=7)
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def risk_coverage_plot(
    series: dict[str, tuple],
    out_path: str | Path,
    *,
    title: str | None = None,
):
    """Risk–coverage curves with AURC in the legend — the failure-detection
    figure behind ``metrics/aurc.py`` (reference ``evaluation/metrics/
    aurc.py``, fd-shifts convention: coverage = fraction kept when abstaining
    below a confidence threshold).

    ``series``: {label: (risks, confids)} per method/heatmap.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..metrics.aurc import aurc, rc_curve_stats

    fig, ax = plt.subplots(figsize=(4.2, 3.2))
    for label, (risks, confids) in series.items():
        coverages, sel_risks, _ = rc_curve_stats(
            np.asarray(risks, np.float64), np.asarray(confids, np.float64))
        a = aurc(np.asarray(risks), np.asarray(confids))
        ax.plot(coverages, sel_risks, lw=1.4, label=f"{label} (AURC {a:.4f})")
    ax.set_xlabel("coverage")
    ax.set_ylabel("selective risk")
    ax.set_title(title or "risk–coverage")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def reliability_diagram(
    correct,
    confids,
    out_path: str | Path,
    *,
    n_bins: int = 20,
    title: str | None = None,
):
    """Reliability diagram (accuracy vs confidence per bin + sample density)
    with the ECE/ACE annotated — the diagnostic figure behind the
    reference's calibration metrics (``evaluation/metrics/ace.py``,
    ``global_utils/debug_ace.py``). Bins match ``evaln.tasks._calib_stats``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .tasks import calc_ace, calc_ece

    correct = np.asarray(correct).astype(np.float64).reshape(-1)
    confids = np.clip(np.asarray(confids).astype(np.float64).reshape(-1), 0, 1)
    bins = np.linspace(0.0, 1.0 + 1e-8, n_bins + 1)
    binids = np.digitize(confids, bins) - 1
    total = np.bincount(binids, minlength=n_bins + 1)[:n_bins]
    acc = np.full(n_bins, np.nan)
    conf = np.full(n_bins, np.nan)
    nz = total > 0
    acc[nz] = np.bincount(binids, weights=correct, minlength=n_bins + 1)[:n_bins][nz] / total[nz]
    conf[nz] = np.bincount(binids, weights=confids, minlength=n_bins + 1)[:n_bins][nz] / total[nz]

    centers = (bins[:-1] + bins[1:])[:n_bins] / 2
    fig, (ax, axd) = plt.subplots(
        2, 1, figsize=(4.2, 5), sharex=True,
        gridspec_kw={"height_ratios": [3, 1]})
    ax.plot([0, 1], [0, 1], "--", color="gray", lw=1, label="perfect")
    width = 1.0 / n_bins
    ax.bar(centers[nz], acc[nz], width=width * 0.92, alpha=0.75,
           label="accuracy", edgecolor="black", linewidth=0.3)
    ax.plot(centers[nz], conf[nz], "r.-", lw=1, ms=4, label="mean confidence")
    ece, ace = calc_ece(correct, confids), calc_ace(correct, confids)
    ax.set_ylabel("accuracy")
    ax.set_title(title or f"ECE {ece:.4f} · ACE {ace:.4f}")
    ax.legend(fontsize=7, loc="upper left")
    axd.bar(centers[nz], total[nz] / total.sum(), width=width * 0.92,
            color="gray")
    axd.set_xlabel("confidence")
    axd.set_ylabel("density", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def plot_tta_augs(
    image,
    out_path: str | Path,
    *,
    n: int = 8,
    tta_config=None,
    seed: int = 0,
):
    """Debug grid of TTA draws: augmented image and its inversion round trip
    (the reference's ``global_utils/plot_tta_augs.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax
    import jax.numpy as jnp

    from ..sampling.tta import TTAConfig, apply_tta, invert_tta, sample_tta_params

    cfg = tta_config or TTAConfig()
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w = img.shape[:2]
    batch = jnp.broadcast_to(img[None], (n,) + img.shape)
    params = sample_tta_params(cfg, jax.random.key(seed), n, h, w)
    aug = apply_tta(batch, params)
    back = invert_tta(aug, params)

    fig, axes = plt.subplots(3, n, figsize=(1.8 * n, 5.6))
    for i in range(n):
        for row, arr, title in ((0, batch, "input"), (1, aug, "augmented"),
                                (2, back, "inverted")):
            a = np.asarray(arr[i])
            axes[row, i].imshow(a[..., 0] if a.shape[-1] not in (3, 4) else a,
                                cmap="gray")
            axes[row, i].set_xticks([]), axes[row, i].set_yticks([])
            if i == 0:
                axes[row, i].set_ylabel(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)
