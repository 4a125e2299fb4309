"""Miniature end-to-end ValUES study (tools/values_study.py).

2 AU x 3 EU (incl. a 2-member deep ensemble) x 1 seed, 2 epochs on a small
toy — pins that the study driver runs train -> inference -> EvalMatrix ->
AL arm -> report end to end and emits the committed-artifact set with
finite direction-of-effect numbers.
The full reduced study (4 AU x 3 EU x 2 seeds) is run offline and committed
under ``studies/values_toy/``.
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from diffuncertainty_tpu.tools.values_study import StudyConfig, run_values_study

pytestmark = pytest.mark.slow


def test_miniature_study(tmp_path):
    scfg = StudyConfig(
        workdir=tmp_path / "study",
        au_types=("softmax", "ssn"),
        eu_methods=("none", "dropout", "ensemble"),
        seeds=(0,),
        epochs=2,
        n_pred=2,
        n_models=2,
        num_train=12,
        num_val=4,
        num_test=6,
        num_ood=6,
        num_unlabeled=6,
        ood_shifts=("ood_noise",),
        al_arm=("softmax", "dropout"),
    )
    summary = run_values_study(scfg)

    assert summary["matrix"]["versions"] == 6
    # every version preflights as non-missing after the run
    assert all(not s["missing"] for s in summary["preflight"].values())

    # the deep-ensemble cells trained n_models independently-seeded members
    for au in ("softmax", "ssn"):
        members = sorted(
            p.name for p in (tmp_path / "study" / "saves" / f"{au}_ensemble").iterdir()
        )
        assert members == ["s0_m0", "s0_m1"]

    report = tmp_path / "study" / "report"
    assert (report / "ds_task_table.csv").is_file()
    assert (report / "ds_task_table.tex").is_file()
    assert (report / "summary.json").is_file()
    assert (report / "REPORT.md").is_file()

    checks = summary["checks"]
    shift = checks["ood_auroc"]["per_shift"]["ood_noise"]
    assert np.isfinite(shift["softmax_entropy_baseline"])
    assert "dropout" in shift["eu_methods"]
    assert "ensemble" in shift["eu_methods"]
    amb = checks["ambiguity_ncc"]
    assert set(amb["mean_au_ncc_by_au_type"]) == {"softmax", "ssn"}
    al = checks["al_improvement"]
    assert al["computed_both_directions"]

    # the diagnostic figure set is emitted next to the table
    figures = summary["artifacts"]["figures"]
    for name in ("risk_coverage", "reliability", "ood_auroc_ood_noise",
                 "al_improvement", "triptych", "task_overview"):
        assert name in figures and Path(figures[name]).is_file(), name
    assert (report / "ds_task_ranks.csv").is_file()

    # the table carries seed-grouped method columns
    import pandas as pd

    table = pd.read_csv(report / "ds_task_table.csv", header=[0, 1], index_col=[0, 1, 2, 3])
    method_cols = {c[1] for c in table.columns}
    assert {"softmax_none", "softmax_dropout", "softmax_ensemble",
            "ssn_none", "ssn_dropout", "ssn_ensemble"} <= method_cols

    # re-run resumes (cells cached) and reproduces the artifact set quickly
    summary2 = run_values_study(dataclasses.replace(scfg))
    assert summary2["matrix"]["versions"] == 6
    assert summary2["wall_seconds"] < summary["wall_seconds"]


def test_workdir_parameter_mismatch_raises(tmp_path):
    """A workdir holding cells built with different shaping parameters must
    be rejected up front, before any (re)training runs."""
    import pytest

    work = tmp_path / "study"
    work.mkdir()
    (work / "study_meta.json").write_text(json.dumps({"epochs": 3}))
    with pytest.raises(ValueError, match="different study parameters"):
        run_values_study(StudyConfig(workdir=work, epochs=6))


def test_al_arm_rejects_ensemble(tmp_path):
    """Second-cycle retraining is single-member; an ensemble AL arm must be
    rejected with a clear message rather than silently training one member."""
    import pytest

    from diffuncertainty_tpu.tools.values_study import _run_al_arm

    scfg = StudyConfig(workdir=tmp_path, al_arm=("softmax", "ensemble"))
    with pytest.raises(ValueError, match="al_arm does not support"):
        _run_al_arm(scfg, tmp_path, tmp_path, tmp_path, seed=0)


def test_interpretation_lines_follow_the_numbers():
    from diffuncertainty_tpu.tools.values_study import _interpretation_lines

    checks = {
        "ood_auroc": {"per_shift": {
            "ood_noise": {"eu_beats_entropy_baseline": False},
            "ood_blur": {"eu_beats_entropy_baseline": True},
        }},
        "ambiguity_ncc": {"mean_au_ncc_by_au_type": {"softmax": 0.02, "ssn": -0.01}},
    }
    al = {"al_improvement_uncertainty": -0.0007, "al_improvement_worst": -0.0008}
    text = "\n".join(_interpretation_lines(checks, al))
    assert "ood_blur" in text and "positive" in text and "flat within noise" in text

    # failing checks flip the phrasing instead of keeping a canned narrative
    checks["ood_auroc"]["per_shift"]["ood_blur"]["eu_beats_entropy_baseline"] = False
    checks["ambiguity_ncc"]["mean_au_ncc_by_au_type"] = {"softmax": -0.2}
    al = {"al_improvement_uncertainty": 0.3, "al_improvement_worst": -0.2}
    text = "\n".join(_interpretation_lines(checks, al))
    assert "NO shift" in text and "NEGATIVE" in text and "non-flat" in text

def test_stale_checkpoint_is_retrained(tmp_path):
    """A cell whose 'last' checkpoint stopped before the final epoch (e.g. a
    killed run that had just saved epoch 0) must be retrained on resume, not
    skipped — an epoch-0 cell once slipped into a 40-epoch matrix and only
    the end-of-matrix epoch-uniformity assert caught it."""
    import json as _json

    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.tools.values_study import _train_cell

    scfg = StudyConfig(workdir=tmp_path / "study", epochs=2, num_train=8,
                       num_val=4, batch_size=4)
    toy = generate_toy_dataset(
        tmp_path / "toy", num_train=8, num_val=4, num_test=4, num_ood=4,
        size=32, seed=0,
    )
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    # plant a stale epoch-0 "last" checkpoint
    stale = scfg.workdir / "saves" / "softmax_none" / "s0" / "checkpoints" / "last"
    stale.mkdir(parents=True)
    (stale / "meta.json").write_text(_json.dumps({"epoch": 0, "kind": "full"}))
    (stale / "config.json").write_text("{}")

    ckpt = _train_cell(scfg, toy, splits, "softmax", "none", 0, "s0", 0)
    meta = _json.loads((ckpt / "meta.json").read_text())
    assert int(meta["epoch"]) == scfg.epochs - 1  # retrained to completion

    # a genuinely finished cell is still skipped (resume semantics intact)
    import time
    t0 = time.time()
    again = _train_cell(scfg, toy, splits, "softmax", "none", 0, "s0", 0)
    assert again == ckpt and time.time() - t0 < 5.0
