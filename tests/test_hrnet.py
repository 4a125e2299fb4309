"""HRNet backbone tests."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.models.hrnet import HRNet, HRNetSpec


def small_spec(**kw):
    return HRNetSpec(width=8, stage1_channels=8, num_modules=(1, 1, 1), num_blocks=1, **kw)


def test_hrnet_forward_shapes():
    model = HRNet(num_classes=2, spec=small_spec())
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    assert "batch_stats" in variables
    out = model.apply(variables, x)  # eval mode: running stats
    assert out.logits.shape == (2, 32, 32, 2)
    assert out.features.shape[1:3] == (8, 8)  # 1/4 resolution
    assert out.features.shape[-1] == 8 + 16 + 32 + 64


def test_hrnet_train_mode_updates_batch_stats():
    model = HRNet(num_classes=2, spec=small_spec())
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    out, updated = model.apply(variables, x, True, mutable=["batch_stats"])
    leaves_old = jax.tree.leaves(variables["batch_stats"])
    leaves_new = jax.tree.leaves(updated["batch_stats"])
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(leaves_old, leaves_new)
    )
    assert changed


def test_hrnet_ssn_heads():
    model = HRNet(num_classes=2, spec=small_spec(), ssn=True, ssn_rank=3)
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    out = model.apply(variables, x)
    n = 32 * 32 * 2
    assert out.ssn_mean.shape == (1, n)
    assert out.ssn_cov_factor.shape == (1, n, 3)
    out2 = model.apply(variables, x, mean_only=True)
    np.testing.assert_array_equal(np.asarray(out2.ssn_cov_factor), 0.0)


def test_hrnet_factory_and_guard():
    cfg = load_config(data="toy64", network="hrnet-s", model="softmax", eu_method="none")
    built = build_model(cfg)
    assert built.backbone == "hrnet" and built.has_batch_stats
    with pytest.raises(ValueError, match="does not support"):
        build_model(load_config(data="toy64", network="hrnet-s", model="diffusion"))


def test_hrnet_final_dropout_stochastic():
    model = HRNet(num_classes=2, spec=small_spec(final_dropout=0.5))
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True
    )
    a = model.apply(variables, x, rngs={"dropout": jax.random.key(2)})
    b = model.apply(variables, x, rngs={"dropout": jax.random.key(3)})
    assert np.abs(np.asarray(a.features) - np.asarray(b.features)).max() > 0


def test_hrnet_trains_on_toy(tmp_path):
    from diffuncertainty_tpu.core.checkpoint import load_checkpoint
    from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.train import Trainer

    toy = generate_toy_dataset(tmp_path / "toy", num_train=8, num_val=4, num_test=4,
                               num_ood=2, size=32, seed=0)
    cfg = load_config(
        data="toy64", network="hrnet-s", model="softmax", eu_method="none",
        overrides=[f"save_dir={tmp_path}", "trainer.max_epochs=1",
                   "data.batch_size=4", "trainer.learning_rate=0.001"],
    )
    built = dataclasses.replace(
        build_model(cfg), module=HRNet(num_classes=2, spec=small_spec())
    )
    trainer = Trainer(cfg, built=built)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    train_ds = MultiRaterDataset(splits, toy, split="train", return_all_raters=False)
    state = trainer.fit(BatchLoader(train_ds, 4, shuffle=True, drop_last=True), None)
    assert int(state.step) == 2
    assert "batch_stats" in state.model_state
    st, _, _ = load_checkpoint(trainer.workdir / "checkpoints" / "last")
    assert "batch_stats" in st["params"]
