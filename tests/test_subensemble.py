"""Masked sub-ensemble tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models import subensemble as se
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.sampling import SamplerSpec, make_sampler
from diffuncertainty_tpu.train.subensemble_trainer import (
    SubensembleConfig,
    materialize_for_inference,
    train_subensemble_masks,
)

SMALL = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
]


@pytest.fixture(scope="module")
def built_and_params():
    built = build_model(load_config(data="toy64", network="unet4", overrides=SMALL))
    x = jnp.ones((1, 16, 16, 3))
    params = built.module.init(jax.random.key(0), x)
    return built, params


def test_mask_logits_cover_all_kernels(built_and_params):
    _, params = built_and_params
    masks = se.init_mask_logits(params["params"], num_masks=3)
    assert len(masks) > 10  # every conv/dense in the unet
    for v in masks.values():
        assert v["in"].shape[0] == 3 and v["out"].shape[0] == 3


def test_hard_materialization_masks_channels(built_and_params):
    _, params = built_and_params
    base = params["params"]
    masks = se.init_mask_logits(base, 2)
    key = next(iter(masks))
    # member 0: kill input channel 0 of that layer; member 1 keeps all
    masks[key]["in"] = masks[key]["in"].at[0, 0].set(-1.0)
    m0 = se.masked_params(base, masks, 0, normalize=False)
    m1 = se.masked_params(base, masks, 1, normalize=False)
    path = key.split("/")
    k0 = m0
    k_base = base
    for p in path:
        k0 = k0[p]
        k_base = k_base[p]
    np.testing.assert_array_equal(np.asarray(k0["kernel"][..., 0, :]), 0.0)
    k1 = m1
    for p in path:
        k1 = k1[p]
    np.testing.assert_allclose(np.asarray(k1["kernel"]), np.asarray(k_base["kernel"]))


def test_renormalization_factor(built_and_params):
    _, params = built_and_params
    base = params["params"]
    masks = se.init_mask_logits(base, 1)
    key = next(iter(masks))
    cin = masks[key]["in"].shape[1]
    # keep half the input channels
    logits = np.full((1, cin), 1.0, np.float32)
    logits[0, : cin // 2] = -1.0
    masks[key]["in"] = jnp.asarray(logits)
    m = se.masked_params(base, masks, 0, normalize=True)
    node = m
    base_node = base
    for p in key.split("/"):
        node = node[p]
        base_node = base_node[p]
    keep = (cin - cin // 2) / cin
    surviving = np.asarray(node["kernel"][..., cin // 2 :, :])
    expected = np.asarray(base_node["kernel"][..., cin // 2 :, :]) / keep
    np.testing.assert_allclose(surviving, expected, rtol=1e-5)


def test_materialized_members_feed_sampler(built_and_params):
    built, params = built_and_params
    prng = np.random.default_rng(7)
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.asarray(prng.standard_normal(p.shape), p.dtype), params
    )
    masks = se.init_mask_logits(params["params"], 3)
    # random mask logits -> distinct members
    rng = np.random.default_rng(0)
    for k in masks:
        masks[k]["in"] = jnp.asarray(rng.standard_normal(masks[k]["in"].shape), jnp.float32)
        masks[k]["out"] = jnp.asarray(rng.standard_normal(masks[k]["out"].shape), jnp.float32)
    stacked = materialize_for_inference(params, masks, 3)
    sampler = make_sampler(
        built, SamplerSpec(n_pred=1, n_members=3, member_mode="params_stack")
    )
    stack = sampler(stacked, jnp.ones((2, 16, 16, 3)), jax.random.key(0))
    assert stack.groups.shape[0] == 3
    flat = np.asarray(stack.groups).reshape(3, -1)
    assert np.unique(flat, axis=0).shape[0] == 3


def test_iou_and_size_penalty_behavior():
    masks = {
        "layer": {
            "in": jnp.asarray([[5.0, 5.0], [5.0, 5.0]]),
            "out": jnp.asarray([[5.0, -5.0], [5.0, -5.0]]),
        }
    }
    # identical masks -> IoU ~ 1
    assert float(se.mean_pairwise_iou(masks, hard=True)) == pytest.approx(1.0)
    masks2 = {
        "layer": {
            "in": jnp.asarray([[5.0, 5.0], [5.0, 5.0]]),
            "out": jnp.asarray([[5.0, -5.0], [-5.0, 5.0]]),
        }
    }
    assert float(se.mean_pairwise_iou(masks2, hard=True)) == pytest.approx(0.0)
    # size penalty: all-on masks exceed a small target
    p = float(se.submodel_size_penalty(masks, target_fraction=0.1))
    assert p > 0


def test_mask_training_reduces_loss(built_and_params):
    built, params = built_and_params
    rng = np.random.default_rng(0)
    batches = [
        {
            "image": rng.random((4, 16, 16, 3)).astype(np.float32),
            "seg": rng.integers(0, 2, (4, 16, 16)).astype(np.int32),
        }
    ]
    cfg = SubensembleConfig(num_masks=2, steps=5, learning_rate=0.05)
    masks = train_subensemble_masks(built, params, batches, cfg)
    # logits moved away from zero init
    moved = max(float(jnp.abs(v["out"]).max()) for v in masks.values())
    assert moved > 0
