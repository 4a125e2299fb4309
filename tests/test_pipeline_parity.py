"""Job-level pipeline parity: the full repo inference job vs a
reference-semantics torch replica on identical inputs.

BASELINE.md's fidelity clause is about the *pipeline output*, not just the
model forward: the reference writes pred_seg PNGs and TU/AU/EU float TIFFs
per image (``test_2D.py:860-1120``), with the C2 measures computed by
``unc_mod_utils/test_utils.py:833-864`` (``calculate_uncertainty``). These
tests convert reference torch checkpoints, run the production
``UncertaintyInference`` job end to end, and diff the *written files* against
a torch replica that follows the reference's own semantics:

- exact job (deterministic 2-checkpoint deep ensemble, no TTA): every
  written artifact matches — heatmap TIFFs to <2e-5, quantized pred PNGs
  exactly away from argmax knife-edges;
- TTA job: the replica replays the job's exact transform draws but warps
  with cv2 (the engine the reference's TTA inversion uses,
  ``test_2D.py:174-288``) — the measured heatmap delta IS the
  pipeline-level cost of the TPU warp backend, recorded in PARITY.md §2.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
from PIL import Image

from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
from diffuncertainty_tpu.data.augment import TrainAugmentConfig, normalize_batch
from diffuncertainty_tpu.data.toy import generate_toy_dataset
from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
from diffuncertainty_tpu.sampling.tta import TTAConfig, sample_tta_params
from diffuncertainty_tpu.tools.import_reference_checkpoint import convert

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# reference model import (read-only, omegaconf stubbed)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_module():
    if "omegaconf" not in sys.modules:
        stub = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class ListConfig(list):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, resolve=True):
                return dict(x)

            @staticmethod
            def merge(a, b):
                out = dict(a)
                out.update(b)
                return DictConfig(out)

        stub.DictConfig = DictConfig
        stub.ListConfig = ListConfig
        stub.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = stub
    ref_dir = "/root/reference/uncertainty_modeling/models"
    try:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [ref_dir]
        sys.modules.setdefault("refmodels", pkg)
        spec = importlib.util.spec_from_file_location(
            "refmodels.diff_unet2D_module", f"{ref_dir}/diff_unet2D_module.py"
        )
        ref = importlib.util.module_from_spec(spec)
        sys.modules["refmodels.diff_unet2D_module"] = ref
        spec.loader.exec_module(ref)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference DiffUnet unavailable: {exc}")
    return ref


NET = dict(
    in_channels=3, out_channels=2, model_channels=8,
    num_res_blocks=[1, 1], num_middle_res_blocks=1,
    attention_resolutions=[-1], channel_mult=(1, 2), num_heads=4,
)


def _make_ref_ckpt(ref_module, tmp_path, seed, name):
    """A randomized reference torch DiffUnet + its Lightning-style .ckpt."""
    from diffuncertainty_tpu.core.config import load_config

    model = ref_module.DiffUnet(**NET).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    payload = {
        "state_dict": {f"model.{k}": v for k, v in model.state_dict().items()},
        "epoch": 3,
    }
    ckpt_file = tmp_path / f"{name}.ckpt"
    torch.save(payload, ckpt_file)
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="none",
        overrides=[
            "network.model_channels=8", "network.num_res_blocks=[1,1]",
            "network.num_middle_res_blocks=1", "network.channel_mult=[1,2]",
            "network.attention_resolutions=[-1]", "network.num_heads=4",
            "data.num_classes=2", "data.ignore_index=-1",
            "data.split_name=default",
        ],
    )
    out = convert(ckpt_file, tmp_path / f"{name}_imported", config=cfg)
    return model, out


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    return generate_toy_dataset(
        tmp_path_factory.mktemp("toy_pp"), num_train=8, num_val=2, num_test=6,
        num_ood=2, num_raters=3, size=32, seed=7,
    )


def _torch_softmax(model, images_norm):
    """(B,H,W,3) normalized numpy -> (B,H,W,C) softmax via the torch model."""
    with torch.no_grad():
        x = torch.from_numpy(np.transpose(images_norm, (0, 3, 1, 2)))
        logits = model(x).numpy()
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    return np.transpose(probs, (0, 2, 3, 1)).astype(np.float64)


def _ref_uncertainty(member_probs):
    """TU/AU/EU from a (P,H,W,C) member softmax stack — the reference's
    ``calculate_uncertainty`` semantics (entropy of mean / mean entropy /
    difference, with 0*log0 treated as 0), re-expressed in numpy."""
    mean = member_probs.mean(axis=0)
    plogp = np.where(mean > 0, mean * np.log(mean), 0.0)
    tu = -plogp.sum(axis=-1)
    ent = np.where(member_probs > 0, member_probs * np.log(member_probs), 0.0)
    au = -ent.sum(axis=-1).mean(axis=0)
    return {"TU": tu, "AU": au, "EU": tu - au}


def _compare_pred_png(path, replica_idx, replica_probs, *, tie_tol=1e-4):
    """Written binary pred PNG vs replica argmax. fp32-vs-torch forwards
    differ at ~1e-6, so argmax may flip only where the replica's class-1
    probability is a knife-edge tie."""
    got = np.asarray(Image.open(path))
    want = (replica_idx > 0).astype(np.uint8) * 255
    diff = got != want
    if diff.any():
        margin = np.abs(replica_probs[..., 1] - 0.5)
        assert margin[diff].max() < tie_tol, (
            f"{path.name}: {int(diff.sum())} mismatched pixels not at "
            f"argmax ties (worst margin {margin[diff].max():.2e})")


def test_ensemble_job_outputs_match_torch_replica(ref_module, toy_dir, tmp_path):
    """Exact pipeline parity: deterministic 2-checkpoint deep-ensemble job
    (no dropout, no TTA) vs the torch replica, on the written files."""
    m1, ckpt1 = _make_ref_ckpt(ref_module, tmp_path, 21, "m1")
    m2, ckpt2 = _make_ref_ckpt(ref_module, tmp_path, 22, "m2")

    icfg = InferenceConfig(
        n_pred=1, batch_size=3, seed=5, tta=False, mesh_shape=(1, 1),
        data_input_dir=str(toy_dir), save_dir=str(tmp_path / "job"),
        save_likelihood=False,
    )
    inf = UncertaintyInference([ckpt1, ckpt2], icfg)
    assert inf.sources[0]["spec"].member_mode == "params_stack"
    inf.run_split("id")
    out = inf.split_dir("id")

    aug = inf.cfg.data.augmentations
    aug_cfg = TrainAugmentConfig(mean=tuple(aug.mean), std=tuple(aug.std))
    ds = MultiRaterDataset(
        toy_dir / "splits" / "default" / "firstCycle" / "splits.pkl",
        toy_dir, split="id", return_all_raters=True)
    loader = BatchLoader(ds, icfg.batch_size, shuffle=False)

    worst = {"TU": 0.0, "AU": 0.0, "EU": 0.0}
    n_checked = 0
    for batch in loader:
        imgs = np.asarray(normalize_batch(jnp.asarray(batch["image"]), aug_cfg),
                          np.float32)
        probs = np.stack([_torch_softmax(m, imgs) for m in (m1, m2)])  # (2,B,H,W,C)
        for i in np.nonzero(np.asarray(batch["valid"]))[0]:
            image_id = batch["image_id"][i]
            member_probs = probs[:, i]  # (2,H,W,C)
            maps = _ref_uncertainty(member_probs)
            for k, want in maps.items():
                got = np.asarray(Image.open(out / k / f"{image_id}.tif"))
                worst[k] = max(worst[k], float(np.abs(got - want).max()))
                np.testing.assert_allclose(got, want, atol=2e-5)
            mean = member_probs.mean(axis=0)
            _compare_pred_png(out / "pred_seg" / f"{image_id}_mean.png",
                              mean.argmax(-1), mean)
            for g in range(2):
                _compare_pred_png(out / "pred_seg" / f"{image_id}_{g + 1:02d}.png",
                                  member_probs[g].argmax(-1), member_probs[g])
            n_checked += 1
    assert n_checked == 6
    print(f"\npipeline-parity exact job: worst heatmap abs deltas {worst}")


def test_tta_job_delta_vs_cv2_replica(ref_module, toy_dir, tmp_path):
    """Pipeline-level TTA delta: our TTA job (default separable warp) vs a
    torch+cv2 replica replaying the job's exact transform draws. Bounds the
    end-to-end heatmap cost of the TPU warp backend (op-level bound:
    tests/test_warp_tta.py)."""
    model, ckpt = _make_ref_ckpt(ref_module, tmp_path, 31, "tta_m")

    n_pred, bsz = 4, 3
    icfg = InferenceConfig(
        n_pred=n_pred, batch_size=bsz, seed=9, tta=True, mesh_shape=(1, 1),
        data_input_dir=str(toy_dir), save_dir=str(tmp_path / "tta_job"),
        save_likelihood=False,
    )
    inf = UncertaintyInference([ckpt], icfg)
    # eu=none softmax+TTA: flat fold, n_pred TTA rounds as singleton groups
    assert inf.meta.n_groups == n_pred and inf.meta.samples_per_group == 1
    inf.run_split("id")
    out = inf.split_dir("id")

    aug = inf.cfg.data.augmentations
    aug_cfg = TrainAugmentConfig(mean=tuple(aug.mean), std=tuple(aug.std))
    tta_cfg = TTAConfig(
        hflip_p=aug.hflip_p, rotation_limit=aug.rotation_limit,
        scale_limit=tuple(aug.scale_limit),
        augment_mult=aug.augment_mult if aug.augment_mult > 0 else 1.0)
    ds = MultiRaterDataset(
        toy_dir / "splits" / "default" / "firstCycle" / "splits.pkl",
        toy_dir, split="id", return_all_raters=True)
    loader = BatchLoader(ds, bsz, shuffle=False)

    def cv2_warp(img, m, border):
        return cv2.warpAffine(
            img, np.asarray(m, np.float64), (img.shape[1], img.shape[0]),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=border, borderValue=0.0)

    # replay the runner's RNG chain: per-batch split, then the flat
    # sampler's (k_drop, k_tta) split and one sample_tta_params draw for
    # all rows (row layout: round*B + image, sampler.py::_tile_rows)
    rng = jax.random.key(icfg.seed)
    worst = 0.0
    deltas = []
    n_checked = 0
    for batch in loader:
        rng, key = jax.random.split(rng)
        _, k_tta = jax.random.split(key)
        b = np.asarray(batch["image"]).shape[0]
        h, w = np.asarray(batch["image"]).shape[1:3]
        params = sample_tta_params(tta_cfg, k_tta, n_pred * b, h, w)
        fwd = np.asarray(params.forward, np.float64)
        inv = np.asarray(params.inverse, np.float64)
        imgs = np.asarray(normalize_batch(jnp.asarray(batch["image"]), aug_cfg),
                          np.float32)
        for i in np.nonzero(np.asarray(batch["valid"]))[0]:
            image_id = batch["image_id"][i]
            rounds = []
            for s in range(n_pred):
                r = s * b + i
                # forward warp = dst->src inverse matrix, constant-0 border
                warped = cv2_warp(imgs[i], inv[r], cv2.BORDER_CONSTANT)
                p = _torch_softmax(model, warped[None])[0].astype(np.float32)
                # inversion = dst->src forward matrix, replicate border,
                # then simplex renormalization (test_2D.py:188-194)
                back = cv2_warp(p, fwd[r], cv2.BORDER_REPLICATE)
                norm = back.sum(-1, keepdims=True)
                rounds.append(np.where(norm > 1e-12, back / np.clip(norm, 1e-12, None), back))
            maps = _ref_uncertainty(np.stack(rounds).astype(np.float64))
            got = np.asarray(Image.open(out / "TU" / f"{image_id}.tif"))
            d = float(np.abs(got - maps["TU"]).max())
            worst = max(worst, d)
            deltas.append(float(np.abs(got - maps["TU"]).mean()))
            n_checked += 1
    assert n_checked == 6
    # pipeline-level bound for the separable-warp fast path vs the cv2
    # engine: TU is bounded by log(2)≈0.69 for 2 classes; the warp backends
    # differ by double-interpolation smoothing (op-level <0.08 pointwise)
    assert worst < 0.35, worst
    assert float(np.mean(deltas)) < 0.02, np.mean(deltas)
    print(f"\npipeline-parity TTA job vs cv2 replica: max-abs TU delta "
          f"{worst:.4f}, mean-abs {np.mean(deltas):.5f}")
