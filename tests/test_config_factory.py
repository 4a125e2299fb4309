"""Config composition and model factory tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.config import ExperimentConfig, apply_overrides, load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.models.prob_unet import ProbUnet
from diffuncertainty_tpu.models.unet import DiffUnet


def test_default_composition():
    cfg = load_config()
    assert cfg.data.name == "lidc64"
    assert cfg.network.model_channels == 32
    assert cfg.model.au_type == "softmax"
    assert cfg.eu_method.name == "none"
    assert cfg.auto_exp_name == "lidc64_unet_s_au=softmax_eu=none"


def test_group_patching_and_overrides():
    cfg = load_config(model="diffusion", eu_method="dropout",
                      overrides=["trainer.max_epochs=5", "data.batch_size=8",
                                 "network.channel_mult=[1,2]"])
    assert cfg.model.au_type == "diffusion"
    assert cfg.network.final_act == "softmax"  # patched by model/diffusion.yaml
    assert cfg.eu_method.dropout.probability_values == (0.2,)
    assert cfg.trainer.max_epochs == 5
    assert cfg.data.batch_size == 8
    assert cfg.network.channel_mult == (1, 2)


def test_num_classes_interpolation():
    cfg = load_config(data="toy64", network="unet4")
    assert cfg.network.out_channels == cfg.data.num_classes == 2


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(ExperimentConfig(), ["trainer.not_a_key=1"])


def test_round_trip_dict():
    cfg = load_config(model="ssn", eu_method="swag")
    restored = ExperimentConfig.from_dict(cfg.to_dict())
    assert restored == cfg


def test_factory_softmax():
    built = build_model(load_config(overrides=["network.model_channels=8",
                                               "network.num_res_blocks=[1,1]",
                                               "network.channel_mult=[1,2]",
                                               "network.attention_resolutions=[-1]"]))
    assert isinstance(built.module, DiffUnet)
    assert built.au_type == "softmax" and built.eu_type == "none"
    assert not built.is_generative and not built.needs_dropout_rng


def test_factory_diffusion_concat_channels():
    built = build_model(load_config(model="diffusion",
                                    overrides=["network.model_channels=8",
                                               "network.num_res_blocks=[1,1]",
                                               "network.channel_mult=[1,2]"]))
    assert built.module.in_channels == 3 + 2  # x_t concat
    assert built.module.diffusion and built.diffusion is not None
    assert built.diffusion_num_steps == 10 and built.diffusion_sampler_type == "ddpm"
    assert built.is_generative


def test_factory_dropout_eu():
    built = build_model(load_config(eu_method="dropout",
                                    overrides=["network.model_channels=8",
                                               "network.num_res_blocks=[1,1]",
                                               "network.channel_mult=[1,2]"]))
    assert built.eu_type == "dropout" and built.needs_dropout_rng
    assert built.module.dropout_spec.probability_values == (0.2,)


def test_factory_swag_variants():
    assert build_model(load_config(eu_method="swag")).eu_type == "swag"
    assert build_model(load_config(eu_method="swag_diag")).eu_type == "swag_diag"
    assert build_model(load_config(eu_method="ensemble")).eu_type == "ensemble"


def test_factory_conflicting_eu_rejected():
    cfg = load_config(eu_method="swag", overrides=["network.dropout=0.1"])
    with pytest.raises(ValueError, match="Conflicting EU"):
        build_model(cfg)


def test_factory_prob_unet_builds_and_runs():
    cfg = load_config(model="prob_unet", data="toy64", network="unet4",
                      overrides=["network.model_channels=8",
                                 "network.num_res_blocks=[1,1]",
                                 "network.channel_mult=[1,2]",
                                 "network.attention_resolutions=[-1]"])
    built = build_model(cfg)
    assert isinstance(built.module, ProbUnet)
    x = jnp.ones((2, 16, 16, 3))
    segm = jax.nn.one_hot(jnp.zeros((2, 16, 16), jnp.int32), 2)
    params = built.module.init(
        jax.random.key(0), x, segm, built.module.init_input_latent(2)
    )
    out = built.module.apply(params, x, segm)
    assert out.logits is None
    assert out.prior.mu.shape == (2, 6)
    assert out.posterior is not None
    logits = built.module.apply(
        params, out.features, jnp.zeros((2, 6)), method=built.module.decode
    )
    assert logits.shape == (2, 16, 16, 2)


def test_factory_ssn():
    built = build_model(load_config(model="ssn",
                                    overrides=["network.model_channels=8",
                                               "network.num_res_blocks=[1,1]",
                                               "network.channel_mult=[1,2]"]))
    assert built.au_type == "ssn" and built.module.ssn
    x = jnp.ones((1, 16, 16, 3))
    params = built.module.init(jax.random.key(0), x)
    out = built.module.apply(params, x)
    assert out.ssn_cov_factor.shape[-1] == 10
