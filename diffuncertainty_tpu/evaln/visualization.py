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
from typing import Sequence

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


def rank_table(table: pd.DataFrame) -> pd.DataFrame:
    """Per-row method ranks of a ``task_table`` (1 = best), plus a
    ``mean_rank`` summary row — the reference's rank-aggregated view of the
    methods x tasks matrix (``visualization/helpers.py:195-203`` ``to_rank``
    composed over the result table). Rank direction follows
    ``LOWER_IS_BETTER`` per metric row; ties share the average rank."""
    means = table["mean"] if "mean" in table.columns.get_level_values(0) else table
    metric_pos = (
        list(means.index.names).index("metric")
        if "metric" in (means.index.names or []) else 1
    )
    ranks = pd.DataFrame(index=means.index, columns=means.columns, dtype=float)
    for idx, row in means.iterrows():
        metric_name = str(idx[metric_pos]) if isinstance(idx, tuple) else str(idx)
        ascending = metric_name.lower() in LOWER_IS_BETTER
        ranks.loc[idx] = row.rank(ascending=ascending, method="average")
    summary = ranks.mean(axis=0)
    summary.name = ("mean_rank",) + ("-",) * (ranks.index.nlevels - 1) \
        if ranks.index.nlevels > 1 else "mean_rank"
    return pd.concat([ranks, summary.to_frame().T])


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


def metric_matrix_grid(
    df: pd.DataFrame,
    *,
    cells: Sequence[tuple[str, str]],
    out_path: str | Path,
    ncols: int = 3,
):
    """Grid of (unc_type x aggregation) heatmaps, one per (task, metric)
    cell — the reference's ``plot_mm_grid`` composition
    (``visualization/helpers.py:1382-1421``) rebuilt on ``metric_matrix``'s
    pivot. Cells with no rows render as an empty axis instead of failing,
    so a partial results tree still produces the panel."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nrows = -(-len(cells) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4.2 * ncols, 2.8 * nrows),
                             squeeze=False)
    for ax in axes.flat[len(cells):]:
        ax.axis("off")
    for (task, metric), ax in zip(cells, axes.flat):
        try:
            pivot = metric_matrix(df, task=task, metric=metric)
        except ValueError:
            ax.axis("off")
            ax.set_title(f"{task}: {metric} (no rows)", fontsize=8)
            continue
        im = ax.imshow(pivot.values, cmap="viridis")
        ax.set_xticks(range(pivot.shape[1]), pivot.columns, rotation=30,
                      ha="right", fontsize=7)
        ax.set_yticks(range(pivot.shape[0]), pivot.index, fontsize=7)
        for i in range(pivot.shape[0]):
            for j in range(pivot.shape[1]):
                ax.text(j, i, f"{pivot.values[i, j]:.3f}", ha="center",
                        va="center", color="white", fontsize=7)
        ax.set_title(f"{task}: {metric}", fontsize=9)
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def entangle_metric(u_first, u_second, lower_is_better: bool = False):
    """Paper's entanglement score Δ = s·(arctan2(a, b) − π/4)/(π/4) ∈ [-1, 1].

    Maps a pair of scores (e.g. AU-AUROC vs EU-AUROC, or uncertainty on
    correct vs wrong pixels) to a signed balance: 0 means perfectly
    entangled (a == b), +1 means the first member dominates entirely.
    Matches ``visualization/helpers.py:693-696`` (sign flip via
    ``lower_is_better``); accepts scalars or arrays.
    """
    s = -1.0 if lower_is_better else 1.0
    return s * (np.arctan2(u_first, u_second) - np.pi / 4) / (np.pi / 4)


def _au_eu_scatter_ax(ax, df: pd.DataFrame, task: str, metric: str,
                      aggregation: str) -> pd.DataFrame:
    """Draw one AU-vs-EU scatter on ``ax``; returns the version pivot."""
    sel = df[(df["task"] == task) & (df["metric"] == metric)
             & (df["aggregation"].isin([aggregation, "-"]))]
    pivot = sel.pivot_table(index="version", columns="unc_type",
                            values="value", aggfunc="mean")
    if "AU" not in pivot.columns or "EU" not in pivot.columns:
        raise ValueError("need both AU and EU rows for the scatter")
    ax.scatter(pivot["AU"], pivot["EU"])
    for version, row in pivot.iterrows():
        delta = float(entangle_metric(row["AU"], row["EU"]))
        ax.annotate(f"{version} (Δ={delta:+.2f})", (row["AU"], row["EU"]),
                    fontsize=7, xytext=(3, 3), textcoords="offset points")
    lims = [min(pivot["AU"].min(), pivot["EU"].min()) - 0.02,
            max(pivot["AU"].max(), pivot["EU"].max()) + 0.02]
    ax.plot(lims, lims, "k--", alpha=0.4)
    ax.set_xlabel(f"AU {metric}")
    ax.set_ylabel(f"EU {metric}")
    ax.set_title(f"{task} ({aggregation})")
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

    fig, ax = plt.subplots(figsize=(5, 5))
    _au_eu_scatter_ax(ax, df, task, metric, aggregation)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def scatter_grid(
    df: pd.DataFrame,
    *,
    cells: Sequence[tuple[str, str, str]],
    out_path: str | Path,
    ncols: int = 2,
):
    """Grid of AU-vs-EU scatters over (task, metric, aggregation) cells —
    the reference's ``plot_scatter_grid`` composition
    (``visualization/helpers.py:1826-1915``). Cells whose rows lack an
    AU or EU series render as an annotated empty axis."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nrows = -(-len(cells) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4.5 * nrows),
                             squeeze=False)
    for ax in axes.flat[len(cells):]:
        ax.axis("off")
    for (task, metric, aggregation), ax in zip(cells, axes.flat):
        try:
            _au_eu_scatter_ax(ax, df, task, metric, aggregation)
        except ValueError:
            ax.axis("off")
            ax.set_title(f"{task}: {metric} (no AU/EU rows)", fontsize=8)
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


# ---------------------------------------------------------------------------
# dataset-qualitative paper panels
# ---------------------------------------------------------------------------

def _to_rgb(img: np.ndarray) -> np.ndarray:
    """float [0,1] grayscale/RGB -> (H, W, 3)."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3 and img.shape[-1] >= 3:
        return img[..., :3].copy()
    if img.ndim == 3:
        img = img[..., 0]
    return np.repeat(img[..., None], 3, axis=-1)


def _overlay_outline(rgb: np.ndarray, mask: np.ndarray, color, lw: float = 1.0):
    """Alpha-blend the erosion-outline of a binary mask onto an RGB image
    in place (the reference's label overlay style, helpers.py:2366-2420)."""
    from scipy import ndimage as ndi

    binary = np.asarray(mask) > 0
    if not binary.any():
        return rgb
    eroded = ndi.binary_erosion(binary, iterations=max(1, int(round(lw))))
    outline = binary & ~eroded
    alpha = color[3] if len(color) == 4 else 0.75
    for c in range(3):
        rgb[..., c] = np.where(outline, (1 - alpha) * rgb[..., c] + alpha * color[c],
                               rgb[..., c])
    return rgb


def _image_grid(tiles: list[np.ndarray], cols: int, pad: int, pad_color) -> np.ndarray:
    """Concatenate RGB tiles into a rows x cols grid with padding all around."""
    h, w = tiles[0].shape[:2]
    rows = (len(tiles) + cols - 1) // cols
    canvas = np.ones((rows * h + (rows + 1) * pad, cols * w + (cols + 1) * pad, 3))
    canvas *= np.asarray(pad_color, np.float64)
    for k, tile in enumerate(tiles):
        r, c = divmod(k, cols)
        y = pad + r * (h + pad)
        x = pad + c * (w + pad)
        canvas[y:y + h, x:x + w] = tile
    return canvas


def dataset_overview_panel(
    data_dir: str | Path,
    out_path: str | Path,
    *,
    split_name: str = "default",
    pools: "list[tuple[str, str]] | None" = None,
    ood_pools: "list[tuple[str, str]] | None" = None,
    n_rows: int = 3,
    cols_per_pool: "dict[str, int] | None" = None,
    num_label_rows: int = 2,
    label_color=(1.0, 0.1, 0.1, 0.8),
    pad: int = 1,
    seed: int = 0,
    norm: str = "gauss3",
):
    """Train | Val | Test(id) | Test(ood) dataset-overview figure.

    The LIDC qualitative panel of the reference
    (``visualization/helpers.py:1917-2255``, ``plot_lidc``): per-pool image
    grids side by side, rater-0 label outlines overlaid on the first
    ``num_label_rows`` rows, one randomly-drawn OOD shift pool with its own
    sub-caption, and an arrow from the id-test grid to the ood grid. Works
    on any dataset tree following the preprocessed+splits contract.

    ``norm``: "gauss3" standardizes each image and clips to +-3 std (the
    reference's vmin/vmax=-3/3 display); "minmax" rescales to [0, 1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.dataset import MultiRaterDataset, load_splits

    data_dir = Path(data_dir)
    splits_path = data_dir / "splits" / split_name / "firstCycle" / "splits.pkl"
    fold = load_splits(splits_path)[0]
    rng = np.random.default_rng(seed)

    pools = pools or [("train", "Train"), ("val", "Val"), ("id", "Test (id)")]
    if ood_pools is None:
        ood_pools = [
            (k, k.removeprefix("ood_").replace("_", " ").capitalize())
            for k in fold
            if isinstance(k, str) and k.startswith("ood_") and "&" not in k
        ]
    ood_choice = ood_pools[rng.integers(len(ood_pools))] if ood_pools else None
    cols = {"train": 4, "val": 1, "id": 1, "ood": 1, **(cols_per_pool or {})}

    def normalize(img):
        img = np.asarray(img, np.float64)
        if norm == "gauss3":
            img = (img - img.mean()) / (img.std() + 1e-8)
            img = (np.clip(img, -3, 3) + 3) / 6
        else:
            img = (img - img.min()) / (img.max() - img.min() + 1e-8)
        return img

    def pool_grid(pool_key, n_cols):
        ds = MultiRaterDataset(splits_path, data_dir, split=pool_key,
                               return_all_raters=True)
        count = min(n_rows * n_cols, len(ds))
        idxs = rng.choice(len(ds), size=count, replace=False)
        tiles = []
        for k, i in enumerate(idxs):
            sample = ds.load(int(i))
            rgb = _to_rgb(normalize(sample["image"]))
            if k // n_cols < num_label_rows:
                _overlay_outline(rgb, np.asarray(sample["seg"])[0], label_color)
            tiles.append(rgb)
        return _image_grid(tiles, n_cols, pad, (0.0, 0.0, 0.0))

    entries = [(key, title, pool_grid(key, cols.get(key, 1)), None)
               for key, title in pools]
    if ood_choice is not None:
        key, sub = ood_choice
        entries.append((key, "Test (ood)", pool_grid(key, cols.get("ood", 1)), sub))

    widths = [g.shape[1] for _, _, g, _ in entries]
    fig, axes = plt.subplots(
        1, len(entries), figsize=(sum(widths) / 40 + len(entries), widths and entries[0][2].shape[0] / 40 + 1),
        gridspec_kw={"width_ratios": widths},
    )
    if len(entries) == 1:
        axes = [axes]
    for ax, (key, title, grid, sub) in zip(axes, entries):
        ax.imshow(grid)
        ax.set_title(title, fontsize=13)
        if sub:
            ax.set_xlabel(sub, fontsize=9)
        ax.set_xticks([]), ax.set_yticks([])
    if ood_choice is not None and len(entries) >= 2:
        # arrow: id-test grid -> ood grid (figure coordinates)
        fig.canvas.draw()
        src, dst = axes[-2].get_position(), axes[-1].get_position()
        fig.patches.append(matplotlib.patches.FancyArrow(
            src.x1 + 0.005, (src.y0 + src.y1) / 2,
            dst.x0 - src.x1 - 0.01, 0, width=0.004,
            transform=fig.transFigure, color="black",
        ))
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return Path(out_path)


def grouped_rows_panel(
    data_dir: str | Path,
    out_path: str | Path,
    *,
    group_col: str = "machine",
    groups: "list[str] | None" = None,
    group_titles: "list[str] | None" = None,
    split_name: str | None = None,
    pool: str | None = None,
    n_cols: int = 6,
    label_cols: int = 3,
    class_colors=((0.1, 1.0, 0.1, 0.6), (1.0, 0.1, 0.1, 0.6)),
    label_lw: float = 1.0,
    pad: int = 1,
    seed: int = 0,
):
    """Rows-by-metadata-group qualitative figure.

    The Chaksu scanner panel of the reference
    (``visualization/helpers.py:2307-2520``, ``plot_chaksu``): one row per
    metadata group (scanner machine), randomly sampled images per row, all
    raters' class outlines overlaid on the first ``label_cols`` columns
    (class ``c`` >= threshold outlines colored ``class_colors[c-1]`` — disc/
    cup for retina), and a row title per group. Generic over the metadata
    column, so GTA/Cityscapes-style grouping panels reuse it.
    """
    import csv as _csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data_dir = Path(data_dir)
    meta_path = data_dir / "preprocessed" / "metadata.csv"
    by_group: dict[str, list[str]] = {}
    with open(meta_path) as f:
        for row in _csv.DictReader(f):
            by_group.setdefault(row[group_col], []).append(row["image_file"])
    groups = groups or sorted(by_group)
    group_titles = group_titles or groups
    rng = np.random.default_rng(seed)

    img_root = data_dir / "preprocessed"
    lbl_root = data_dir / "preprocessed" / "labels"

    def load_rgb(rel):
        img = np.load(img_root / rel)
        img = np.asarray(img, np.float64)
        img = (img - img.min()) / (img.max() - img.min() + 1e-8)
        return _to_rgb(img)

    def rater_masks(rel):
        base = Path(rel).stem
        out = []
        for r in range(64):
            p = lbl_root / f"{base}_{r:02d}_mask.npy"
            if not p.exists():
                break
            out.append(np.load(p))
        return out

    rows = []
    for g in groups:
        files = by_group.get(g, [])
        if not files:
            raise ValueError(f"metadata group {g!r} has no images")
        take = rng.choice(len(files), size=min(n_cols, len(files)), replace=False)
        tiles = []
        for k, fi in enumerate(take):
            rgb = load_rgb(files[int(fi)])
            if k < label_cols:
                for mask in rater_masks(files[int(fi)]):
                    for ci, color in enumerate(class_colors):
                        _overlay_outline(rgb, np.asarray(mask) >= ci + 0.5,
                                         color, label_lw)
            tiles.append(rgb)
        rows.append(_image_grid(tiles, len(tiles), pad, (0.0, 0.0, 0.0)))

    fig, axes = plt.subplots(len(rows), 1,
                             figsize=(n_cols * 1.6, len(rows) * 1.8))
    if len(rows) == 1:
        axes = [axes]
    for ax, grid, title in zip(axes, rows, group_titles):
        ax.imshow(grid)
        ax.set_ylabel(title, fontsize=12)
        ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def uncertainty_triptych_panel(
    raws: "dict[str, dict]",
    out_path: str | Path,
    *,
    n_images: int = 2,
    gt_color=(1.0, 0.1, 0.1, 0.9),
    cmap: str = "viridis",
):
    """Uncertainty-type qualitative grid: per image, three rows (AU/EU/TU)
    with one heatmap column per method.

    The reference's ``qualitative_plot_uncertainty`` layout
    (``visualization/helpers.py:2966-3410``): each image occupies a 3-row
    block; the leading column shows the input with rater outlines on the AU
    row and individual rater ground-truth masks on the EU/TU rows. Heatmaps
    are computed from each record's group stack with the fused C2 ops.
    ``raws``: {method label: ``collect_raw_predictions`` result}.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from ..ops.entropy import uncertainty_heatmaps

    unc_types = ("AU", "EU", "TU")
    labels = list(raws)
    by_id = [
        {r["image_id"]: r for r in raws[label]["records"]} for label in labels
    ]
    common = [i for i in by_id[0] if all(i in d for d in by_id[1:])][:n_images]
    if not common:
        raise ValueError("no shared image_ids across the provided methods")

    n_rows = 3 * len(common)
    n_cols = 1 + len(labels)
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(1.9 * n_cols, 1.9 * n_rows), squeeze=False,
    )
    for b, image_id in enumerate(common):
        base = by_id[0][image_id]
        rgb = _to_rgb(np.asarray(base["image"], np.float64))
        rgb = (rgb - rgb.min()) / (rgb.max() - rgb.min() + 1e-8)
        raters = np.asarray(base["gt"]).reshape((-1,) + rgb.shape[:2])
        outlined = rgb.copy()
        for rater in raters:
            _overlay_outline(outlined, rater, gt_color)
        # leading column: input+raters on the AU row, rater GTs below
        axes[3 * b][0].imshow(outlined)
        axes[3 * b][0].set_ylabel(f"{image_id}\nAU", fontsize=7)
        for k in (1, 2):
            ax = axes[3 * b + k][0]
            if k - 1 < raters.shape[0]:
                ax.imshow(raters[k - 1], cmap="gray", interpolation="nearest")
            ax.set_ylabel(unc_types[k], fontsize=7)
        for m, label in enumerate(labels):
            rec = by_id[m][image_id]
            group_means = jnp.asarray(np.asarray(rec["groups"]).mean(axis=1))
            maps = uncertainty_heatmaps(group_means, sample_axis=0, class_axis=-1)
            for k, unc in enumerate(unc_types):
                ax = axes[3 * b + k][1 + m]
                ax.imshow(np.asarray(maps[unc]), cmap=cmap)
                if b == 0 and k == 0:
                    ax.set_title(label, fontsize=9)
    for ax_row in axes:
        for ax in ax_row:
            ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)


def model_comparison_panel(
    raws: "dict[str, dict]",
    out_path: str | Path,
    *,
    n_images: int = 3,
    heatmap: str = "TU",
    gt_color=(1.0, 0.1, 0.1, 0.9),
    cmap: str = "viridis",
):
    """Side-by-side qualitative model comparison: predictions + uncertainty.

    The reference's ``qualitative_plot_models`` / ``qualitative_plot_
    uncertainty`` paper figures (``visualization/helpers.py:2521-3410``):
    rows are images, the first column shows the input with every rater's
    ground-truth outline, then each model contributes a mean-prediction
    column and an uncertainty-heatmap column. ``raws``: {model label:
    ``UncertaintyInference.collect_raw_predictions`` result}; images are
    matched across models by image_id.

    ``heatmap``: "TU" | "AU" | "EU" (computed from each record's group
    stack with the fused C2 ops, exactly as the inference job would).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from ..ops.entropy import one_minus_msr, uncertainty_heatmaps

    labels = list(raws)
    by_id = [
        {r["image_id"]: r for r in raws[label]["records"]} for label in labels
    ]
    common = [i for i in by_id[0] if all(i in d for d in by_id[1:])][:n_images]
    if not common:
        raise ValueError("no shared image_ids across the provided models")

    n_cols = 1 + 2 * len(labels)
    fig, axes = plt.subplots(
        len(common), n_cols, figsize=(1.9 * n_cols, 2.0 * len(common)),
        squeeze=False,
    )
    for row, image_id in enumerate(common):
        base = by_id[0][image_id]
        rgb = _to_rgb(np.asarray(base["image"], np.float64))
        rgb = (rgb - rgb.min()) / (rgb.max() - rgb.min() + 1e-8)
        for rater in np.asarray(base["gt"]).reshape((-1,) + rgb.shape[:2]):
            _overlay_outline(rgb, rater, gt_color)
        axes[row][0].imshow(rgb)
        if row == 0:
            axes[row][0].set_title("input + raters", fontsize=9)
        axes[row][0].set_ylabel(image_id, fontsize=7)
        for m, label in enumerate(labels):
            rec = by_id[m][image_id]
            group_means = jnp.asarray(np.asarray(rec["groups"]).mean(axis=1))
            if group_means.shape[0] > 1:
                maps = uncertainty_heatmaps(group_means, sample_axis=0, class_axis=-1)
                unc = np.asarray(maps[heatmap])
                unc_name = heatmap
            else:
                unc = np.asarray(one_minus_msr(group_means[0], class_axis=-1))
                unc_name = "1-MSR"
            pred = np.asarray(rec["mean"]).argmax(-1)
            ax_p, ax_u = axes[row][1 + 2 * m], axes[row][2 + 2 * m]
            ax_p.imshow(pred, cmap="gray", interpolation="nearest")
            ax_u.imshow(unc, cmap=cmap)
            if row == 0:
                ax_p.set_title(f"{label}\npred", fontsize=9)
                ax_u.set_title(f"{label}\n{unc_name}", fontsize=9)
    for ax_row in axes:
        for ax in ax_row:
            ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return Path(out_path)
