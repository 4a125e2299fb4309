"""Downstream-task metrics: OoD detection, failure detection, calibration,
ambiguity modeling, AL improvement.

Provenance:
- OoD (``evaluation/metrics/auroc.py:90-212``): AUROC of aggregated scores
  over paired id/ood splits plus detection-rate@50%-acquisition;
- failure detection (``aurc.py:113-153``): AURC / E-AURC of risk = 1 - dice
  vs confidence = -aggregated score;
- calibration (``ace.py:14-545``): Platt fit on the val split with 256
  log-space binned compression, then per-image ACE/ECE/eqACE + global
  gACE/gECE via a streaming accumulator;
- ambiguity (``ncc.py:9-82``): NCC between the rater-variance map and the
  predicted heatmap;
- AL improvement (``al_improvement.py:6-72``).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from sklearn.metrics import auc, roc_curve

from ..metrics.aurc import aurc, eaurc
from .dataloader import ResultsReader

try:  # sklearn private; exact match with the reference's Platt fit
    from sklearn.calibration import _sigmoid_calibration as _sk_sigmoid_calibration
except ImportError:  # pragma: no cover
    _sk_sigmoid_calibration = None


# --------------------------------------------------------------------------
# OoD detection
# --------------------------------------------------------------------------

def ood_detection_paired(
    id_reader: ResultsReader,
    ood_reader: ResultsReader,
    out_path: str | Path,
    dataset_key: str = "paired",
) -> dict:
    """AUROC + detection rate over a paired (id, ood) split pair."""
    results: dict = {dataset_key: {"mean": {}}}
    for unc in id_reader.unc_types:
        agg_id = id_reader.aggregated(unc)
        agg_ood = ood_reader.aggregated(unc)
        if not agg_id or not agg_ood:
            continue
        aggregations = next(iter(agg_id.values())).keys()
        for aggregation in aggregations:
            scores, labels = [], []
            for source, label in ((agg_id, 0), (agg_ood, 1)):
                for sample, rec in source.items():
                    if aggregation not in rec:
                        continue
                    scores.append(rec[aggregation]["max_score"])
                    labels.append(label)
            if len(set(labels)) < 2:
                continue
            fpr, tpr, _ = roc_curve(labels, scores)
            roc_auc = float(auc(fpr, tpr))
            # detection rate at 50% acquisition: query the most-uncertain half
            order = np.argsort(scores)[::-1]
            n_query = int(np.ceil(len(scores) * 0.5))
            n_ood = sum(labels)
            detected = sum(labels[i] for i in order[:n_query])
            rate = detected / n_ood if n_ood else 0.0
            results[dataset_key]["mean"].setdefault(unc, {})[aggregation] = {
                "metrics": {"ood_detection_rate": float(rate), "auroc": roc_auc}
            }
    out_path = Path(out_path)
    existing = json.loads(out_path.read_text()) if out_path.exists() else {}
    existing.update(results)
    out_path.write_text(json.dumps(existing, indent=4))
    return results


# --------------------------------------------------------------------------
# failure detection
# --------------------------------------------------------------------------

def failure_detection(reader: ResultsReader, out_path: str | Path | None = None) -> dict:
    metrics = reader.metrics()
    results: dict = {"mean": {}}
    for unc in reader.unc_types:
        agg = reader.aggregated(unc)
        if not agg:
            continue
        aggregations = next(iter(agg.values())).keys()
        results["mean"][unc] = {}
        for aggregation in aggregations:
            risks, confids = [], []
            for image_id in reader.image_ids:
                rec = metrics[image_id]
                dice = rec["metrics"].get("dice", rec.get("dice"))
                risks.append(1.0 - dice)
                key = next(k for k in agg if k.startswith(image_id))
                confids.append(-agg[key][aggregation]["max_score"])
            risks = np.asarray(risks)
            confids = np.asarray(confids)
            results["mean"][unc][aggregation] = {
                "metrics": {
                    "aurc": float(aurc(risks, confids)),
                    "eaurc": float(eaurc(risks, confids)),
                }
            }
    if out_path is not None:
        Path(out_path).write_text(json.dumps(results, indent=2))
    return results


# --------------------------------------------------------------------------
# calibration
# --------------------------------------------------------------------------

def _sigmoid_calibration(f: np.ndarray, y: np.ndarray, w: np.ndarray | None):
    if _sk_sigmoid_calibration is not None:
        return _sk_sigmoid_calibration(f, y, sample_weight=w)
    # Newton fallback on the Platt objective (should not normally trigger)
    a, b = 0.0, 0.0
    w = np.ones_like(f) if w is None else w
    for _ in range(100):
        p = 1.0 / (1.0 + np.exp(a * f + b))
        g_a = np.sum(w * (p - y) * -f)
        g_b = np.sum(w * (p - y) * -1)
        h = w * p * (1 - p)
        h_aa = np.sum(h * f * f) + 1e-12
        h_bb = np.sum(h) + 1e-12
        a -= g_a / h_aa
        b -= g_b / h_bb
    return a, b


def platt_scale_params(
    val_reader: ResultsReader, ignore_value=None, n_bins: int = 256
) -> dict:
    """Fit Platt params per unc type on the val split with binned compression
    (``ace.py:14-196``): log-space bins over [1e-12, 1e2], two weighted
    samples per non-empty bin, F = -mean bin uncertainty."""
    bin_edges = np.logspace(-12, 2, num=n_bins + 1, dtype=np.float64)
    params: dict = {}
    for unc in val_reader.unc_types:
        pos = np.zeros(n_bins, np.int64)
        neg = np.zeros(n_bins, np.int64)
        sum_unc = np.zeros(n_bins, np.float64)
        total = np.zeros(n_bins, np.int64)
        for image_id in val_reader.image_ids:
            refs = val_reader.get_reference_segs(image_id)
            pred = val_reader.get_mean_pred_seg(image_id)
            unc_map = val_reader.get_unc_map(image_id, unc)
            if pred.shape != unc_map.shape:
                unc_map = np.swapaxes(unc_map, 0, 1)
            correct = refs == pred[None]
            valid = refs != ignore_value if ignore_value is not None else np.ones(refs.shape, bool)
            u = np.broadcast_to(unc_map[None], refs.shape)[valid].ravel()
            c = correct[valid].ravel().astype(np.int8)
            if u.size == 0:
                continue
            idx = np.clip(np.digitize(u, bin_edges) - 1, 0, n_bins - 1)
            sum_unc += np.bincount(idx, weights=u, minlength=n_bins)
            total += np.bincount(idx, minlength=n_bins)
            pos += np.bincount(idx[c == 1], minlength=n_bins)
            neg += np.bincount(idx[c == 0], minlength=n_bins)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_unc = np.divide(sum_unc, total, out=np.zeros_like(sum_unc), where=total > 0)
        fs, ys, ws = [], [], []
        for b in range(n_bins):
            if total[b] == 0:
                continue
            if pos[b] > 0:
                fs.append(-mean_unc[b]); ys.append(1.0); ws.append(float(pos[b]))
            if neg[b] > 0:
                fs.append(-mean_unc[b]); ys.append(0.0); ws.append(float(neg[b]))
        if not fs:
            a, b_param = 0.0, 0.0
        else:
            a, b_param = _sigmoid_calibration(
                np.asarray(fs), np.asarray(ys), np.asarray(ws)
            )
        params[unc] = {"a": float(a), "b": float(b_param)}
    return params


def _calib_stats(correct: np.ndarray, confids: np.ndarray, n_bins: int = 20):
    confids = np.clip(confids, 0.0, 1.0)
    bins = np.linspace(0.0, 1.0 + 1e-8, n_bins + 1)
    binids = np.digitize(confids, bins) - 1
    n = len(bins)
    bin_sums = np.bincount(binids, weights=confids, minlength=n)
    bin_true = np.bincount(binids, weights=correct.astype(np.float64), minlength=n)
    bin_total = np.bincount(binids, minlength=n)
    nz = bin_total != 0
    prob_true = bin_true[nz] / bin_total[nz]
    prob_pred = bin_sums[nz] / bin_total[nz]
    prob_total = bin_total[nz] / bin_total.sum()
    return np.abs(prob_true - prob_pred), prob_total, int(nz.sum())


def calc_ace(correct, confids):
    d, _, n = _calib_stats(correct, confids)
    return float(np.sum(d) / n)


def calc_ece(correct, confids):
    d, pt, _ = _calib_stats(correct, confids)
    return float(np.sum(d * pt))


def calc_eqace(correct, confids, n_bins: int = 20):
    confids = np.clip(np.ravel(confids), 0.0, 1.0)
    correct = np.ravel(correct).astype(np.float64)
    if confids.size == 0:
        return float("nan")
    edges = np.quantile(confids, np.linspace(0, 1, n_bins + 1))
    edges[0], edges[-1] = 0.0, 1.0 + 1e-8
    edges = np.maximum.accumulate(edges)
    binids = np.clip(np.digitize(confids, edges) - 1, 0, n_bins - 1)
    bin_sums = np.bincount(binids, weights=confids, minlength=n_bins)
    bin_true = np.bincount(binids, weights=correct, minlength=n_bins)
    bin_total = np.bincount(binids, minlength=n_bins)
    nz = bin_total > 0
    if not nz.any():
        return float("nan")
    d = np.abs(bin_true[nz] / bin_total[nz] - bin_sums[nz] / bin_total[nz])
    return float(np.sum(d) / nz.sum())


def calibration(
    reader: ResultsReader,
    val_reader: ResultsReader | None = None,
    ignore_value=None,
    platt_file: str | Path | None = None,
) -> dict:
    """Per-image ACE/ECE/eqACE + global gACE/gECE with Platt-scaled confids."""
    exp_path = reader.split_dir.parent
    platt_file = Path(platt_file or exp_path / "platt_scale_params.json")
    if platt_file.exists():
        params = json.loads(platt_file.read_text())
    else:
        if val_reader is None:
            raise ValueError("val_reader needed to fit Platt parameters")
        params = platt_scale_params(val_reader, ignore_value=ignore_value)
        platt_file.write_text(json.dumps(params, indent=2))

    out: dict = {"mean": {}}
    for unc in reader.unc_types:
        a, b = params[unc]["a"], params[unc]["b"]
        aces, eces, eqaces = [], [], []
        g_sums = np.zeros(21)
        g_true = np.zeros(21)
        g_total = np.zeros(21, np.int64)
        for image_id in reader.image_ids:
            refs = reader.get_reference_segs(image_id)
            pred = reader.get_mean_pred_seg(image_id)
            unc_map = reader.get_unc_map(image_id, unc)
            if pred.shape != unc_map.shape:
                unc_map = np.swapaxes(unc_map, 0, 1)
            correct = (refs == pred[None]).astype(int)
            u = np.broadcast_to(unc_map[None], refs.shape)
            if ignore_value is not None:
                mask = refs != ignore_value
                u_v, c_v = u[mask], correct[mask]
            else:
                u_v, c_v = u.ravel(), correct.ravel()
            confids = 1.0 / (1.0 + np.exp((-u_v) * a + b))
            aces.append(calc_ace(c_v, confids))
            eces.append(calc_ece(c_v, confids))
            eqaces.append(calc_eqace(c_v, confids))
            out.setdefault(image_id, {})[unc] = {
                "metrics": {"ace": aces[-1], "ece": eces[-1], "eqace": eqaces[-1]}
            }
            # streaming global accumulation
            cc = np.clip(confids, 0, 1)
            binids = np.digitize(cc, np.linspace(0.0, 1.0 + 1e-8, 21)) - 1
            g_sums += np.bincount(binids, weights=cc, minlength=21)
            g_true += np.bincount(binids, weights=c_v.astype(np.float64), minlength=21)
            g_total += np.bincount(binids, minlength=21)
        nz = g_total > 0
        gace = float(np.sum(np.abs(g_true[nz] / g_total[nz] - g_sums[nz] / g_total[nz])) / nz.sum())
        gece = float(
            np.sum(
                np.abs(g_true[nz] / g_total[nz] - g_sums[nz] / g_total[nz])
                * (g_total[nz] / g_total.sum())
            )
        )
        out["mean"][unc] = {
            "metrics": {
                "ace": float(np.mean(aces)),
                "ece": float(np.mean(eces)),
                "eqace": float(np.mean(eqaces)),
                "gace": gace,
                "gece": gece,
            }
        }
    (reader.split_dir / "calibration.json").write_text(json.dumps(out, indent=2))
    return out


# --------------------------------------------------------------------------
# ambiguity modeling (NCC)
# --------------------------------------------------------------------------

def compute_ncc(gt_unc_map: np.ndarray, pred_unc_map: np.ndarray) -> float:
    mu_gt, mu_pred = np.mean(gt_unc_map), np.mean(pred_unc_map)
    s_gt = np.std(gt_unc_map, ddof=1)
    s_pred = np.std(pred_unc_map, ddof=1)
    if s_gt == 0 or s_pred == 0:
        return 0.0
    prod = np.sum((gt_unc_map - mu_gt) * (pred_unc_map - mu_pred))
    return float(prod / (gt_unc_map.size * s_gt * s_pred))


def ambiguity_modeling(reader: ResultsReader) -> dict:
    out: dict = {"mean": {}}
    for unc in reader.unc_types:
        nccs = []
        for image_id in reader.image_ids:
            gt_map = reader.get_gt_unc_map(image_id)
            pred_map = reader.get_unc_map(image_id, unc)
            if gt_map.shape != pred_map.shape:
                pred_map = np.swapaxes(pred_map, 0, 1)
            ncc = compute_ncc(gt_map, pred_map)
            out.setdefault(image_id, {})[unc] = {"metrics": {"ncc": ncc}}
            nccs.append(ncc)
        out["mean"][unc] = {"metrics": {"ncc": float(np.mean(nccs))}}
    (reader.split_dir / "ambiguity_modeling.json").write_text(json.dumps(out, indent=2))
    return out


# --------------------------------------------------------------------------
# AL improvement (al_improvement.py:6-72)
# --------------------------------------------------------------------------

def al_improvement(
    dice_first_cycle: float,
    dice_second_cycle_unc: float,
    dice_second_cycle_random: float,
) -> float:
    """Relative dice improvement of uncertainty-queried vs random-queried
    second-cycle training."""
    rel_unc = dice_second_cycle_unc / dice_first_cycle - 1.0
    rel_rand = dice_second_cycle_random / dice_first_cycle - 1.0
    return float(rel_unc - rel_rand)
