"""Training loop tests on the toy dataset."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.checkpoint import load_checkpoint, scheduled_epochs
from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
from diffuncertainty_tpu.data.toy import generate_toy_dataset
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.train import Trainer, make_loss_fn

SMALL_NET = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
    "model.diffusion_sampling.num_steps=3",
    "model.n_aleatoric_samples=3",
    "trainer.learning_rate=0.003",
]


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    return generate_toy_dataset(
        tmp_path_factory.mktemp("toy"), num_train=16, num_val=6, num_test=6,
        num_ood=4, size=32, seed=0,
    )


def _loaders(toy_dir, batch=8, train_split="train"):
    splits = toy_dir / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy_dir, split=train_split,
                                 return_all_raters=False, single_rater=False)
    val_ds = MultiRaterDataset(splits, toy_dir, split="val")
    return (
        BatchLoader(train_ds, batch, shuffle=True, seed=0, drop_last=True),
        BatchLoader(val_ds, batch),
    )


def _cfg(tmp_path, model="softmax", eu="none", extra=()):
    return load_config(
        data="toy64", network="unet4", model=model, eu_method=eu,
        overrides=SMALL_NET + [f"save_dir={tmp_path}", "trainer.max_epochs=2",
                               "data.batch_size=8"] + list(extra),
    )


def test_softmax_training_reduces_loss(toy_dir, tmp_path):
    cfg = _cfg(tmp_path, extra=["trainer.max_epochs=6"])
    trainer = Trainer(cfg)
    train_loader, val_loader = _loaders(toy_dir)
    state = trainer.fit(train_loader, val_loader)
    records = [l for l in (trainer.workdir / "metrics.jsonl").read_text().splitlines()]
    import json

    logs = [json.loads(l) for l in records]
    losses = [l["train_loss"] for l in logs if "train_loss" in l]
    assert losses[-1] < losses[0] * 0.9, losses
    dices = [l["val_dice"] for l in logs if "val_dice" in l]
    assert dices[-1] > 0.3  # toy shapes are easy
    # last checkpoint exists and is self-describing
    state_d, cfg2, meta = load_checkpoint(trainer.workdir / "checkpoints" / "last")
    assert cfg2.model.au_type == "softmax"
    assert "params" in state_d and "ema_params" in state_d
    assert meta["epoch"] == 5


def test_ema_tracks_params(toy_dir, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg)
    train_loader, _ = _loaders(toy_dir)
    state = trainer.fit(train_loader, None)
    # EMA differs from params but is close
    p = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.params)])
    e = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.ema_params)])
    assert 0 < np.abs(p - e).max() < 1.0


@pytest.mark.slow
@pytest.mark.parametrize("model", ["ssn", "diffusion", "prob_unet"])
def test_generative_losses_train_one_epoch(toy_dir, tmp_path, model):
    cfg = _cfg(tmp_path, model=model, extra=["trainer.max_epochs=1"])
    trainer = Trainer(cfg)
    train_loader, _ = _loaders(toy_dir)
    state = trainer.fit(train_loader, None)
    assert int(state.step) == 2  # 16 train / 8 batch = 2 steps
    import json

    logs = [json.loads(l) for l in (trainer.workdir / "metrics.jsonl").read_text().splitlines()]
    assert np.isfinite(logs[0]["train_loss"])


def test_swag_collection_schedule(toy_dir, tmp_path):
    cfg = _cfg(
        tmp_path, eu="swag_diag",
        extra=["trainer.max_epochs=6", "eu_method.swag.max_snapshots=3",
               "eu_method.swag.snapshot_frequency=2"],
    )
    trainer = Trainer(cfg)
    # start = 5 - 2*(3-1) = 1 -> collect at epochs 1, 3, 5
    assert trainer.swag_start_epoch == 1
    train_loader, _ = _loaders(toy_dir)
    trainer.fit(train_loader, None)
    assert int(trainer.swag_state.n_models) == 3
    # swag state rides in the checkpoint
    state_d, _, _ = load_checkpoint(trainer.workdir / "checkpoints" / "last")
    assert "swag_state" in state_d
    assert int(state_d["swag_state"]["n_models"]) == 3


def test_scheduled_checkpoints(toy_dir, tmp_path):
    cfg = _cfg(
        tmp_path,
        extra=["trainer.max_epochs=5", "ckpt_save_freq.use_linear_saving=true",
               "ckpt_save_freq.linear_freq=2"],
    )
    trainer = Trainer(cfg)
    train_loader, _ = _loaders(toy_dir)
    trainer.fit(train_loader, None)
    ckpts = sorted(p.name for p in (trainer.workdir / "checkpoints").iterdir())
    assert "epoch_000002" in ckpts and "epoch_000004" in ckpts
    # scheduled ckpts are EMA-only (only_save_ema default true)
    state_d, _, meta = load_checkpoint(trainer.workdir / "checkpoints" / "epoch_000002")
    assert meta["kind"] == "ema_only"
    assert "ema_params" in state_d and "params" not in state_d


def test_scheduled_epochs_exponential():
    eps = scheduled_epochs(
        max_epochs=100, use_linear=False, linear_freq=0,
        use_exponential=True, exponent_base=2.0, exponential_start=10,
    )
    assert eps == [10, 20, 40, 80]


@pytest.mark.slow
def test_bf16_and_remat_training(toy_dir, tmp_path):
    cfg = _cfg(tmp_path, extra=["trainer.precision=bf16", "trainer.remat=true",
                                "trainer.max_epochs=1"])
    trainer = Trainer(cfg)
    assert trainer.built.module.dtype.__name__ == "bfloat16"
    train_loader, _ = _loaders(toy_dir)
    state = trainer.fit(train_loader, None)
    import json

    logs = [json.loads(l) for l in (trainer.workdir / "metrics.jsonl").read_text().splitlines()]
    assert np.isfinite(logs[0]["train_loss"])
    # params stay fp32
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_val_metrics_oracle_match_reference_semantics(toy_dir, tmp_path):
    """trainer.evaluate's val_dice / val_ged oracle-matched against the
    reference's validation metric formulas (lightning_experiment.py:855-891):
    per image, dice = the GED backend's (P=1, G) mean dice of the mean
    prediction vs every rater; ged from the same backend; batch means."""
    import importlib.util

    import jax
    import jax.numpy as jnp
    import torch

    spec = importlib.util.spec_from_file_location(
        "ged_fast", "/root/reference/evaluation/metrics/ged_fast.py")
    try:
        ged_fast = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ged_fast)
    except Exception:
        pytest.skip("reference ged_fast unavailable")

    cfg = _cfg(tmp_path, extra=["trainer.max_epochs=1"])
    trainer = Trainer(cfg)
    train_loader, val_loader = _loaders(toy_dir)
    state = trainer.fit(train_loader, None)
    got = trainer.evaluate(state, val_loader, epoch=0)

    # replay evaluate()'s prediction path with the same keys
    from diffuncertainty_tpu.data.augment import normalize_batch

    params = {**state.params, **(state.model_state or {})}
    pred_j = jax.jit(trainer._mean_prediction)
    rng = jax.random.key(cfg.seed + 1000 + 0)
    exp_dices, exp_geds = [], []
    for batch in val_loader:
        rng, k1, k2 = jax.random.split(rng, 3)
        images = normalize_batch(jnp.asarray(batch["image"]), trainer.aug_cfg)
        probs = pred_j(params, images, k2)
        seg = np.asarray(batch["seg"])
        valid = np.asarray(batch["valid"])
        for b in np.nonzero(valid)[0]:
            res = ged_fast.ged_binary_fast(
                torch.from_numpy(np.asarray(probs[b]))[None].permute(0, 3, 1, 2),
                torch.from_numpy(seg[b]),
                ignore_index=None,
                additional_metrics=["dice"],
            )
            exp_dices.append(float(res["dice"]))
            exp_geds.append(float(res["ged"]))
    np.testing.assert_allclose(got["val_dice"], np.mean(exp_dices), atol=1e-5)
    np.testing.assert_allclose(got["val_ged"], np.mean(exp_geds), atol=1e-5)
