"""End-to-end inference tests: train briefly on toy data, run the
uncertainty-inference pipeline, validate the results tree."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
from PIL import Image

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
from diffuncertainty_tpu.data.toy import generate_toy_dataset
from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
from diffuncertainty_tpu.train import Trainer

SMALL_NET = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
    "model.diffusion_sampling.num_steps=3",
    "model.n_aleatoric_samples=3",
    "trainer.learning_rate=0.003",
    "trainer.max_epochs=2",
    "data.batch_size=8",
]


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    return generate_toy_dataset(
        tmp_path_factory.mktemp("toy"), num_train=16, num_val=4, num_test=6,
        num_ood=4, size=32, seed=0,
    )


def _train(toy_dir, tmp_path, model="softmax", eu="none", extra=()):
    cfg = load_config(
        data="toy64", network="unet4", model=model, eu_method=eu,
        overrides=SMALL_NET + [
            f"save_dir={tmp_path}",
            f"data.data_input_dir={toy_dir}",
            "data.split_name=default",
        ] + list(extra),
    )
    trainer = Trainer(cfg)
    splits = toy_dir / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy_dir, split="train", return_all_raters=False)
    trainer.fit(BatchLoader(train_ds, 8, shuffle=True, drop_last=True), None)
    return trainer


def test_softmax_dropout_inference_end_to_end(toy_dir, tmp_path):
    trainer = _train(toy_dir, tmp_path, eu="dropout")
    ckpt = trainer.workdir / "checkpoints" / "last"
    icfg = InferenceConfig(n_pred=2, n_models=3, batch_size=4, save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference([ckpt], icfg)
    assert inf.built.eu_type == "dropout"
    assert inf.sampler.meta.n_groups == 3  # 3 dropout members, 1 sample each

    summary = inf.run_split("id")
    assert summary["n_images"] == 6
    out_dir = inf.split_dir("id")

    metrics = json.loads((out_dir / "metrics.json").read_text())
    assert len(metrics) == 6
    for rec in metrics.values():
        assert 0.0 <= rec["metrics"]["dice"] <= 1.0
        assert "ged" in rec["metrics"] and "ged_bma" in rec["metrics"]

    # heatmaps: TU = AU + EU, readable float32 TIFFs
    image_id = next(iter(metrics))
    tu = np.asarray(Image.open(out_dir / "TU" / f"{image_id}.tif"))
    au = np.asarray(Image.open(out_dir / "AU" / f"{image_id}.tif"))
    eu = np.asarray(Image.open(out_dir / "EU" / f"{image_id}.tif"))
    assert tu.dtype == np.float32 and tu.shape == (32, 32)
    np.testing.assert_allclose(tu, au + eu, atol=1e-5)
    assert tu.min() >= -1e-6

    # predictions: mean + one per group
    pngs = sorted(p.name for p in (out_dir / "pred_seg").iterdir())
    assert f"{image_id}_mean.png" in pngs
    assert f"{image_id}_01.png" in pngs and f"{image_id}_03.png" in pngs

    likelihood = json.loads((out_dir / "likelihood.json").read_text())
    rec = likelihood[image_id]
    assert len(rec["gt_model_NLL"]) == 4  # raters
    assert len(rec["gt_model_NLL"][0]) == 3  # groups
    assert rec["mean_NLL"] > 0


def test_single_forward_softmax_msr_fallback(toy_dir, tmp_path):
    trainer = _train(toy_dir, tmp_path)
    ckpt = trainer.workdir / "checkpoints" / "last"
    icfg = InferenceConfig(n_pred=1, n_models=1, batch_size=4,
                           save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference([ckpt], icfg)
    assert inf.sampler.meta.n_groups == 1
    inf.run_split("id")
    out_dir = inf.split_dir("id")
    # single prediction -> 1-MSR fallback heatmap dir
    assert (out_dir / "pred_entropy").exists()
    assert not (out_dir / "TU").exists()


def test_deep_ensemble_from_multiple_checkpoints(toy_dir, tmp_path):
    t1 = _train(toy_dir, tmp_path / "m1", extra=["seed=1"])
    t2 = _train(toy_dir, tmp_path / "m2", extra=["seed=2"])
    icfg = InferenceConfig(n_pred=1, batch_size=4, save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference(
        [t1.workdir / "checkpoints" / "last", t2.workdir / "checkpoints" / "last"], icfg
    )
    assert inf.spec.member_mode == "params_stack" and inf.spec.n_members == 2
    summary = inf.run_split("ood_noise")
    assert summary["n_images"] == 4


def test_swag_inference(toy_dir, tmp_path):
    trainer = _train(
        toy_dir, tmp_path, eu="swag_diag",
        extra=["eu_method.swag.max_snapshots=2", "trainer.max_epochs=3"],
    )
    ckpt = trainer.workdir / "checkpoints" / "last"
    icfg = InferenceConfig(n_pred=1, n_models=3, batch_size=4,
                           save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference([ckpt], icfg)
    assert inf.spec.member_mode == "params_stack" and inf.spec.n_members == 3
    summary = inf.run_split("id")
    assert summary["n_images"] == 6
    out = json.loads((inf.split_dir("id") / "metrics.json").read_text())
    assert all(np.isfinite(r["metrics"]["dice"]) for r in out.values())


def test_use_ema_and_skip_existing(toy_dir, tmp_path):
    trainer = _train(toy_dir, tmp_path)
    ckpt = trainer.workdir / "checkpoints" / "last"
    icfg = InferenceConfig(n_pred=1, batch_size=4, use_ema=True,
                           save_dir=str(tmp_path / "results"), skip_existing=True)
    inf = UncertaintyInference([ckpt], icfg)
    assert "_ema" in str(inf.split_dir("id"))
    s1 = inf.run_split("id")
    s2 = inf.run_split("id")
    assert not s1.get("skipped") and s2.get("skipped")


def test_padded_raters_excluded_from_dice_and_nll(toy_dir, tmp_path):
    """Metrics must ignore zero-padded fake raters (combined datasets)."""
    import jax.numpy as jnp

    from diffuncertainty_tpu.infer.batch_metrics import make_batch_metrics
    from diffuncertainty_tpu.sampling.sampler import PredictionStack, SamplerMeta

    rng = np.random.default_rng(0)
    probs1 = rng.random((1, 1, 1, 8, 8, 2)).astype(np.float32)
    probs1 /= probs1.sum(-1, keepdims=True)
    gt_real = rng.integers(0, 2, (1, 2, 8, 8)).astype(np.int32)
    # pad with two fake all-zero raters
    gt_padded = np.concatenate([gt_real, np.zeros((1, 2, 8, 8), np.int32)], axis=1)

    meta = SamplerMeta(1, 1, (False,))
    fn = make_batch_metrics(num_classes=2, ignore_index=-1, meta=meta,
                            compute_ged=False, compute_ged_bma=False)
    stack = PredictionStack(
        jnp.asarray(probs1), jnp.asarray(probs1[:, 0]), jnp.asarray(probs1[0, 0])
    )
    res_real = fn(stack, jnp.asarray(gt_real), jnp.asarray([2]))
    res_padded = fn(stack, jnp.asarray(gt_padded), jnp.asarray([2]))
    np.testing.assert_allclose(
        float(res_real["dice"][0]), float(res_padded["dice"][0]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(res_real["mean_NLL"][0]), float(res_padded["mean_NLL"][0]), atol=1e-6
    )


def test_heterogeneous_ensemble(toy_dir, tmp_path):
    """Mixed checkpoint types (softmax + ssn) combine as singleton groups."""
    t1 = _train(toy_dir, tmp_path / "h1", model="softmax", eu="none")
    t2 = _train(toy_dir, tmp_path / "h2", model="ssn", eu="none")
    icfg = InferenceConfig(n_pred=2, batch_size=4, save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference(
        [t1.workdir / "checkpoints" / "last", t2.workdir / "checkpoints" / "last"], icfg
    )
    assert len(inf.sources) == 2
    # softmax member -> 1 singleton group; ssn member -> n_pred singleton groups
    assert inf.meta.n_groups == 1 + 2
    assert inf.meta.samples_per_group == 1
    assert inf.meta.group_is_generative == (False, True, True)
    summary = inf.run_split("id")
    assert summary["n_images"] == 6
    metrics = json.loads((inf.split_dir("id") / "metrics.json").read_text())
    assert all(np.isfinite(r["metrics"]["dice"]) for r in metrics.values())


def test_mixed_eu_same_structure_goes_per_source(toy_dir, tmp_path):
    """dropout ckpt + plain ckpt (identical trees) must NOT collapse into a
    raw stacked ensemble — the dropout member needs its EU expansion."""
    t1 = _train(toy_dir, tmp_path / "e1", eu="dropout")
    t2 = _train(toy_dir, tmp_path / "e2", eu="none")
    icfg = InferenceConfig(n_pred=1, n_models=3, batch_size=4,
                           save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference(
        [t1.workdir / "checkpoints" / "last", t2.workdir / "checkpoints" / "last"], icfg
    )
    assert len(inf.sources) == 2
    # dropout source expands to 3 members; plain source is a single member
    assert inf.meta.n_groups == 3 + 1
    summary = inf.run_split("id")
    assert summary["n_images"] == 6


def test_generative_ensemble_keeps_member_groups(toy_dir, tmp_path):
    """Two generative sources with matching n_pred keep per-member groups
    (the reference's multiple_generative mode)."""
    t1 = _train(toy_dir, tmp_path / "g1", model="ssn")
    t2 = _train(toy_dir, tmp_path / "g2", model="prob_unet")
    icfg = InferenceConfig(n_pred=3, batch_size=4, save_dir=str(tmp_path / "results"))
    inf = UncertaintyInference(
        [t1.workdir / "checkpoints" / "last", t2.workdir / "checkpoints" / "last"], icfg
    )
    assert len(inf.sources) == 2
    assert inf.meta.n_groups == 2 and inf.meta.samples_per_group == 3
    assert inf.meta.group_is_generative == (True, True)
    summary = inf.run_split("id")
    assert summary["n_images"] == 6


def test_inference_is_deterministic(toy_dir, tmp_path):
    """Same checkpoint + seed -> byte-identical metrics and heatmaps."""
    trainer = _train(toy_dir, tmp_path, eu="dropout")
    ckpt = trainer.workdir / "checkpoints" / "last"
    outs = []
    for run in range(2):
        icfg = InferenceConfig(n_pred=2, n_models=2, batch_size=4, seed=77,
                               save_dir=str(tmp_path / f"res{run}"))
        inf = UncertaintyInference([ckpt], icfg)
        inf.run_split("id")
        outs.append(inf.split_dir("id"))
    m0 = (outs[0] / "metrics.json").read_text()
    m1 = (outs[1] / "metrics.json").read_text()
    assert m0 == m1
    for tif in sorted((outs[0] / "TU").glob("*.tif")):
        a = np.asarray(Image.open(tif))
        b = np.asarray(Image.open(outs[1] / "TU" / tif.name))
        np.testing.assert_array_equal(a, b)


def test_meshed_inference_job_matches_single_device(toy_dir, tmp_path):
    """VERDICT r2 #3: the production inference runner on the 8-virtual-device
    (data, member) mesh must write the same results tree as the forced
    single-device run.

    - dropout job (params replicated, batch sharded over "data"): per-image
      programs have no cross-device reductions -> byte-identical files;
    - 2-checkpoint deep ensemble (stacked params sharded over "member"): the
      group mean crosses devices -> reduction-order tolerance on the floats.
    """
    trainer = _train(toy_dir, tmp_path, eu="dropout")
    ckpt = trainer.workdir / "checkpoints" / "last"
    outs = {}
    for name, mesh_shape in [("single", (1, 1)), ("meshed", None)]:
        icfg = InferenceConfig(n_pred=2, n_models=2, batch_size=4, seed=77,
                               tta=True, mesh_shape=mesh_shape,
                               save_dir=str(tmp_path / f"mesh_{name}"))
        inf = UncertaintyInference([ckpt], icfg)
        if name == "meshed":
            assert inf.mesh is not None and inf.mesh.shape["data"] > 1
        else:
            assert inf.mesh is None
        inf.run_split("id")
        outs[name] = inf.split_dir("id")
    assert (outs["single"] / "metrics.json").read_text() == (
        outs["meshed"] / "metrics.json").read_text()
    for sub in ("TU", "AU", "EU"):
        for tif in sorted((outs["single"] / sub).glob("*.tif")):
            a = np.asarray(Image.open(tif))
            b = np.asarray(Image.open(outs["meshed"] / sub / tif.name))
            np.testing.assert_array_equal(a, b)
    for png in sorted((outs["single"] / "pred_seg").glob("*.png")):
        a = np.asarray(Image.open(png))
        b = np.asarray(Image.open(outs["meshed"] / "pred_seg" / png.name))
        np.testing.assert_array_equal(a, b)

    # stacked members sharded over the mesh "member" axis
    t1 = _train(toy_dir, tmp_path / "em1", extra=["seed=11"])
    t2 = _train(toy_dir, tmp_path / "em2", extra=["seed=12"])
    ckpts = [t1.workdir / "checkpoints" / "last",
             t2.workdir / "checkpoints" / "last"]
    ens = {}
    for name, mesh_shape in [("single", (1, 1)), ("meshed", (4, 2))]:
        icfg = InferenceConfig(n_pred=1, batch_size=4, seed=78,
                               mesh_shape=mesh_shape,
                               save_dir=str(tmp_path / f"ens_{name}"))
        inf = UncertaintyInference(ckpts, icfg)
        if name == "meshed":
            assert inf.mesh is not None and inf.mesh.shape["member"] == 2
        inf.run_split("id")
        ens[name] = inf.split_dir("id")
    ms = json.loads((ens["single"] / "metrics.json").read_text())
    mm = json.loads((ens["meshed"] / "metrics.json").read_text())
    assert set(ms) == set(mm)
    for k in ms:
        for metric, v in ms[k]["metrics"].items():
            np.testing.assert_allclose(mm[k]["metrics"][metric], v, atol=1e-6)
    for tif in sorted((ens["single"] / "TU").glob("*.tif")):
        a = np.asarray(Image.open(tif))
        b = np.asarray(Image.open(ens["meshed"] / "TU" / tif.name))
        np.testing.assert_allclose(b, a, atol=1e-6)


def test_results_writer_async_matches_inline(tmp_path):
    """The background write pool must produce byte-identical files to inline
    writes (only the schedule differs), and flush() must join everything."""
    import numpy as np
    from diffuncertainty_tpu.infer.results import ResultsWriter

    rng = np.random.default_rng(0)
    group_idx = (rng.random((3, 16, 16)) > 0.5).astype(np.int32)
    mean_idx = group_idx.mean(0).round().astype(np.int32)
    heatmaps = {k: rng.random((16, 16)).astype(np.float32) for k in ("TU", "AU", "EU")}

    outs = {}
    for tag, async_writes in (("inline", False), ("pooled", True)):
        w = ResultsWriter(tmp_path / tag, binary=True, async_writes=async_writes)
        for j in range(4):
            w.save_prediction(f"img{j}", group_idx, mean_idx, None)
            w.save_uncertainty(f"img{j}", heatmaps)
            w.add_metrics(f"img{j}", "toy", {"dice": 0.5 + j})
        w.flush()
        outs[tag] = {
            p.relative_to(tmp_path / tag): p.read_bytes()
            for p in sorted((tmp_path / tag).rglob("*")) if p.is_file()
        }
    assert set(outs["inline"]) == set(outs["pooled"])
    for rel, blob in outs["inline"].items():
        assert outs["pooled"][rel] == blob, f"{rel} differs"


def test_results_writer_propagates_queued_write_failure(tmp_path, monkeypatch):
    """A failed write anywhere in the pending queue must surface: the
    backpressure drain may not silently discard done-but-failed futures, and
    flush() must raise (and stop the pool) even when the failure is not the
    oldest future."""
    import numpy as np
    import pytest
    from diffuncertainty_tpu.infer import results as results_mod
    from diffuncertainty_tpu.infer.results import ResultsWriter

    w = ResultsWriter(tmp_path / "out", binary=True, async_writes=True)
    w._max_pending = 3  # tiny queue so the drain path actually runs

    calls = {"n": 0}
    real_write = ResultsWriter._write_tif

    def flaky_write(unc_dir, image_id, arr):
        calls["n"] += 1
        if calls["n"] == 2:  # fail at queue position >0
            raise OSError("disk full")
        real_write(unc_dir, image_id, arr)

    monkeypatch.setattr(results_mod.ResultsWriter, "_write_tif",
                        staticmethod(flaky_write))
    heat = {"TU": np.zeros((4, 4), np.float32)}
    with pytest.raises(OSError, match="disk full"):
        with w:  # production usage: __exit__ aborts/flushes
            for j in range(32):  # push far past max_pending, then join
                w.save_uncertainty(f"img{j:02d}", heat)
    assert w._pool is None  # error path shut the pool down

def test_member_chunk_bounds_fused_program(toy_dir, tmp_path):
    """InferenceConfig.member_chunk=1 must reach the sampler spec and switch
    dropout-member execution from the fully-fused flat-fold program to a
    member-scan, while producing the same results tree. Regression for the
    powered-study OOM: 4 members x 8 pred x batch 16 through the 1024-token
    bottleneck attention is 8 GB fp32 fused — one v5e cannot hold it."""
    trainer = _train(toy_dir, tmp_path, eu="dropout")
    ckpt = trainer.workdir / "checkpoints" / "last"
    icfg = InferenceConfig(n_pred=2, n_models=3, batch_size=4,
                           save_dir=str(tmp_path / "results_chunked"),
                           member_chunk=1)
    inf = UncertaintyInference([ckpt], icfg)
    assert inf.spec.member_chunk == 1
    summary = inf.run_split("id")
    assert summary["n_images"] == 6
    metrics = json.loads((inf.split_dir("id") / "metrics.json").read_text())
    for rec in metrics.values():
        assert 0.0 <= rec["metrics"]["dice"] <= 1.0
