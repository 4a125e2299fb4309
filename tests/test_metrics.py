"""Metric kernel tests: golden values, properties, and reference oracles.

ged_fast from the reference is importable (torch-only) and used as an oracle
for the binary GED. The multiclass GED and AURC are checked against
independent brute-force computations and hand-derived golden values.
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from diffuncertainty_tpu.metrics import (
    dice_bin,
    dice_multiclass_micro,
    soft_dice_loss,
    ged_binary,
    ged_multiclass,
    aurc,
    eaurc,
)

REF_EVAL = "/root/reference"


# --------------------------------------------------------------------------
# Dice
# --------------------------------------------------------------------------

def test_dice_bin_edge_cases():
    z = np.zeros((4, 4), np.int32)
    o = np.zeros((4, 4), np.int32)
    o[1:3, 1:3] = 1
    assert float(dice_bin(jnp.asarray(z), jnp.asarray(z))) == 1.0  # both empty
    assert float(dice_bin(jnp.asarray(o), jnp.asarray(z))) == 0.0  # one empty
    assert float(dice_bin(jnp.asarray(z), jnp.asarray(o))) == 0.0
    assert float(dice_bin(jnp.asarray(o), jnp.asarray(o))) == 1.0
    half = np.zeros((4, 4), np.int32)
    half[1:3, 1:2] = 1  # 2 px vs 4 px, tp=2 -> dice = 2*2/(2+4) = 2/3
    np.testing.assert_allclose(float(dice_bin(jnp.asarray(half), jnp.asarray(o))), 2 / 3, rtol=1e-6)


def test_dice_bin_batched(rng):
    preds = (rng.random((5, 8, 8)) > 0.5).astype(np.int32)
    gts = (rng.random((5, 8, 8)) > 0.5).astype(np.int32)
    batched = np.asarray(dice_bin(jnp.asarray(preds), jnp.asarray(gts)))
    for i in range(5):
        single = float(dice_bin(jnp.asarray(preds[i]), jnp.asarray(gts[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_dice_multiclass_micro_is_accuracy_with_background(rng):
    pred = rng.integers(0, 4, (6, 6))
    tgt = rng.integers(0, 4, (6, 6))
    tgt[0, :] = 255  # ignored row
    valid = tgt != 255
    acc = np.mean(pred[valid] == tgt[valid])
    got = float(dice_multiclass_micro(jnp.asarray(pred), jnp.asarray(tgt), 4, ignore_index=255))
    np.testing.assert_allclose(got, acc, rtol=1e-6)


def test_dice_multiclass_all_ignored_is_one():
    tgt = np.full((4, 4), 255)
    pred = np.zeros((4, 4), np.int32)
    assert float(dice_multiclass_micro(jnp.asarray(pred), jnp.asarray(tgt), 3, ignore_index=255)) == 1.0


def test_dice_multiclass_foreground_micro(rng):
    pred = rng.integers(0, 3, (8, 8))
    tgt = rng.integers(0, 3, (8, 8))
    tp = np.sum((pred == tgt) & (pred >= 1))
    denom = np.sum(pred >= 1) + np.sum(tgt >= 1)
    expected = 2 * tp / denom
    got = float(
        dice_multiclass_micro(jnp.asarray(pred), jnp.asarray(tgt), 3, ignore_index=None, include_background=False)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_soft_dice_matches_reference(rng):
    sys.path.insert(0, REF_EVAL + "/uncertainty_modeling")
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_loss", REF_EVAL + "/uncertainty_modeling/loss_modules.py"
        )
        ref_loss = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_loss)
    except Exception:
        pytest.skip("reference loss module unavailable")
    finally:
        sys.path.remove(REF_EVAL + "/uncertainty_modeling")
    import torch

    probs = rng.random((2, 3, 6, 6)).astype(np.float32)
    probs /= probs.sum(axis=1, keepdims=True)
    tgt = rng.integers(0, 3, (2, 6, 6))
    ref = ref_loss.SoftDiceLoss()(torch.from_numpy(probs), torch.from_numpy(tgt)).item()
    got = float(
        soft_dice_loss(jnp.asarray(np.transpose(probs, (0, 2, 3, 1))), jnp.asarray(tgt))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


# --------------------------------------------------------------------------
# GED
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_ged_fast():
    import importlib.util

    try:
        spec = importlib.util.spec_from_file_location(
            "ged_fast", REF_EVAL + "/evaluation/metrics/ged_fast.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception:
        pytest.skip("reference ged_fast unavailable")
    return mod


@pytest.mark.parametrize("ignore", [None, -1])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ged_binary_matches_reference(ref_ged_fast, ignore, seed):
    import torch

    rng = np.random.default_rng(seed)
    P, G, H, W = 5, 4, 12, 12
    logits = rng.standard_normal((P, 2, H, W)).astype(np.float32)
    softmax = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    gt = rng.integers(0, 2, (G, H, W))
    if ignore is not None:
        gt[:, 0, :] = ignore

    ref = ref_ged_fast.ged_binary_fast(
        torch.from_numpy(softmax),
        torch.from_numpy(gt),
        ignore_index=ignore,
        additional_metrics=["dice", "max_dice_pred", "max_dice_gt", "major_dice"],
    )
    got = ged_binary(
        jnp.asarray(np.transpose(softmax, (0, 2, 3, 1))), jnp.asarray(gt), ignore_index=ignore
    )
    for key in ["ged", "dice", "max_dice_pred", "max_dice_gt", "major_dice"]:
        np.testing.assert_allclose(float(got[key]), ref[key], atol=1e-5, err_msg=key)


def test_ged_binary_empty_predictions(ref_ged_fast):
    """All-empty predictions and raters: both-empty conventions."""
    import torch

    P, G, H, W = 3, 2, 6, 6
    softmax = np.zeros((P, 2, H, W), np.float32)
    softmax[:, 0] = 0.9
    softmax[:, 1] = 0.1  # all predict background
    gt = np.zeros((G, H, W), np.int64)
    ref = ref_ged_fast.ged_binary_fast(torch.from_numpy(softmax), torch.from_numpy(gt))
    got = ged_binary(jnp.asarray(np.transpose(softmax, (0, 2, 3, 1))), jnp.asarray(gt))
    np.testing.assert_allclose(float(got["ged"]), ref["ged"], atol=1e-6)
    assert abs(float(got["ged"])) < 1e-6  # perfect agreement -> ged 0


def test_ged_multiclass_brute_force(rng):
    """Multiclass GED vs an independent O(P*G) numpy accuracy computation."""
    P, G, H, W, C = 4, 3, 8, 8, 5
    logits = rng.standard_normal((P, H, W, C)).astype(np.float32)
    softmax = np.exp(logits) / np.exp(logits).sum(axis=-1, keepdims=True)
    gt = rng.integers(0, C, (G, H, W))
    gt[:, :2, 0] = 0  # some "ignore" pixels (ignore_index=0 like GTA)
    ignore = 0

    pred = softmax.argmax(-1)

    def acc(a, b, mask):
        return 1.0 if mask.sum() == 0 else np.mean(a[mask] == b[mask])

    d_pg = np.array([[acc(pred[i], gt[j], gt[j] != ignore) for j in range(G)] for i in range(P)])
    d_pp = np.array([[np.mean(pred[i] == pred[j]) for j in range(P)] for i in range(P)])
    d_gg = np.array([[acc(gt[i], gt[j], gt[j] != ignore) for j in range(G)] for i in range(G)])
    expected = 2 * (1 - d_pg).mean() - (1 - d_pp).mean() - (1 - d_gg).mean()

    got = ged_multiclass(jnp.asarray(softmax), jnp.asarray(gt), C, ignore_index=ignore)
    np.testing.assert_allclose(float(got["ged"]), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["dice_matrix"]), d_pg, atol=1e-5)


# --------------------------------------------------------------------------
# AURC
# --------------------------------------------------------------------------

def _brute_force_aurc(risks, confids):
    """Independent implementation from the fd-shifts definition: drop samples
    in ascending-confidence order, emit an RC point per distinct confidence,
    trapezoid between consecutive points weighted by fraction dropped.

    Within-tie order is observable (the point emitted at a tie block's first
    element excludes only part of the block), and the reference's spec is
    numpy's DEFAULT unstable argsort (tests/test_eval_parity.py pins bitwise
    agreement with the reference implementation) — use the same here."""
    n = len(risks)
    order = np.argsort(confids)
    r = np.asarray(risks, float)[order]
    c = np.asarray(confids, float)[order]
    points = [(1.0, r.sum() / n)]
    weights = []
    removed = 0.0
    pending = 0
    for i in range(n - 1):
        removed += r[i]
        pending += 1
        if i == 0 or c[i] != c[i - 1]:
            points.append(((n - 1 - i) / n, (r.sum() - removed) / (n - 1 - i)))
            weights.append(pending / n)
            pending = 0
    if pending:
        points.append((0.0, points[-1][1]))
        weights.append(pending / n)
    sr = [p[1] for p in points]
    return sum((sr[i] + sr[i + 1]) * 0.5 * w for i, w in enumerate(weights))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_aurc_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = 50
    risks = rng.random(n)
    confids = rng.random(n)
    confids[10:20] = 0.5  # force ties
    np.testing.assert_allclose(aurc(risks, confids), _brute_force_aurc(risks, confids), rtol=1e-12)


def test_aurc_golden_simple():
    # 2 samples, distinct confidence: points (1, (r0+r1)/2), (0.5, r_high)
    # where r_high is the risk of the more confident sample.
    risks = np.array([1.0, 0.0])
    confids = np.array([0.0, 1.0])  # sample 0 dropped first
    # RC points: (1.0, 0.5) -> (0.5, 0.0) w=0.5; final (0, 0.0) w=0.5
    expected = (0.5 + 0.0) * 0.5 * 0.5 + (0.0 + 0.0) * 0.5 * 0.5
    np.testing.assert_allclose(aurc(risks, confids), expected, rtol=1e-12)


def test_eaurc_matches_reference_formula():
    """E-AURC = AURC - optimal-CSF AURC, where the optimal term uses the
    discrete per-coverage mean (fd-shifts formula) — NOT the trapezoid, so
    eaurc(optimal ranking) is near but not exactly zero."""
    rng = np.random.default_rng(0)
    n = 30
    risks = rng.random(n)
    confids = rng.random(n)
    opt = float((np.sort(risks).cumsum() / np.arange(1, n + 1)).sum() / n)
    np.testing.assert_allclose(eaurc(risks, confids), aurc(risks, confids) - opt, rtol=1e-12)
    # optimal ranking has (weakly) the smallest trapezoid AURC
    assert aurc(risks, -risks) <= aurc(risks, confids) + 1e-12


@pytest.mark.parametrize("binary", [True, False])
def test_ged_padded_raters_match_unpadded(rng, binary):
    """Combined-schema collate pads the rater axis with zero masks
    (reference lidc2d_dataset.py:31-86); with n_raters passed, padded GED
    must equal GED on the unpadded rater set."""
    C = 2 if binary else 4
    P, G_true, pad, H, W = 3, 4, 2, 12, 12
    softmax = rng.random((P, H, W, C)).astype(np.float32)
    softmax /= softmax.sum(-1, keepdims=True)
    gt = rng.integers(0, C, (G_true, H, W)).astype(np.int32)
    gt_padded = np.concatenate([gt, np.zeros((pad, H, W), np.int32)], axis=0)

    if binary:
        want = ged_binary(jnp.asarray(softmax), jnp.asarray(gt), ignore_index=None)
        got = ged_binary(
            jnp.asarray(softmax), jnp.asarray(gt_padded),
            ignore_index=None, n_raters=jnp.asarray(G_true),
        )
    else:
        want = ged_multiclass(jnp.asarray(softmax), jnp.asarray(gt), C, ignore_index=0)
        got = ged_multiclass(
            jnp.asarray(softmax), jnp.asarray(gt_padded), C,
            ignore_index=0, n_raters=jnp.asarray(G_true),
        )
    for key in ["ged", "dice", "max_dice_pred", "max_dice_gt", "major_dice"]:
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), atol=1e-5, err_msg=key
        )
