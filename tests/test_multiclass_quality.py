"""Multi-class full-frame quality loop (data/gta_toy.py + tools/multiclass_quality.py).

Random-weight tiny net on CPU: pins the LOOP mechanics — label-switch toy
generation, member-vmapped sliding-window inference, multiclass macro Dice /
multiclass GED vs switched references, NCC vs the analytic switch map, and
the palette-PNG write/readback — not trained quality (bench.py records that
with the trained asset, ``full_frame_multiclass`` family).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.data import cityscapes_labels as cs
from diffuncertainty_tpu.data.cityscapes import CityscapesDataset
from diffuncertainty_tpu.data.gta_toy import generate_gta_toy
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.tools.multiclass_quality import gta_toy_quality_eval

SMALL_NET = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
]


def test_generator_contract(tmp_path):
    root = generate_gta_toy(tmp_path / "gta", num_train=3, num_val=2, num_test=2,
                            train_size=(32, 32), test_size=(48, 64), seed=0)
    splits = root / "splits" / "default" / "firstCycle" / "splits.pkl"
    train = CityscapesDataset(splits, root, split="train", return_all_raters=False)
    s = train.load(0, np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3) and s["seg"].shape == (32, 32)
    # switched single-rater training targets may carry *_2 alternate ids
    assert s["seg"].max() < cs.NUM_TRAIN_CLASSES
    test = CityscapesDataset(splits, root, split="id", return_all_raters=True,
                             n_reference_samples=3)
    refs = test.load(0)["seg"]
    assert refs.shape == (3, 48, 64)
    # idempotent regeneration (manifest short-circuit)
    again = generate_gta_toy(tmp_path / "gta", num_train=3, num_val=2, num_test=2,
                             train_size=(32, 32), test_size=(48, 64), seed=0)
    assert again == root


def test_analytic_switch_map_matches_bernoulli_variance():
    mask = np.zeros((8, 8), np.uint8)
    mask[:4] = cs.name2trainId["road"]
    mask[4:] = cs.name2trainId["sky"]  # not switchable
    unc = cs.gt_switch_uncertainty_map(mask)
    p = cs.GT_SWITCH_PROBS["road"]
    assert np.allclose(unc[:4], p * (1 - p))
    assert np.all(unc[4:] == 0.0)


def test_multiclass_quality_loop(tmp_path):
    cfg = load_config(data="gta_toy", network="unet4", model="softmax",
                      eu_method="dropout", overrides=SMALL_NET)
    built = build_model(cfg)
    import jax
    import jax.numpy as jnp

    rng = jax.random.key(0)
    x = jnp.zeros((1, 32, 32, built.module.in_channels), jnp.float32)
    params = built.module.init({"params": rng, "dropout": rng}, x)

    out = gta_toy_quality_eval(
        built, params, cfg.data, frames=2, frame_size=(64, 96),
        window=32, stride=16, members=2, n_references=3,
        data_dir=str(tmp_path / "gta_eval"), timing_reps=1,
    )
    assert out["palette_png_roundtrip"] is True
    for key in ("dice_macro", "ged_multiclass", "ncc_tu_vs_analytic",
                "ncc_au_vs_analytic", "frames_per_sec"):
        assert np.isfinite(out[key]), (key, out)
    assert 0.0 <= out["dice_macro"] <= 1.0
    assert 0.0 <= out["ged_multiclass"] <= 2.0
    assert -1.0 <= out["ncc_tu_vs_analytic"] <= 1.0
