"""Full-model output parity: reference torch DiffUnet vs Flax import.

The reference module is imported read-only with a minimal omegaconf stub
(only isinstance targets and ``OmegaConf.to_container`` are needed when
constructing ``DiffUnet`` directly). Weights transfer through
``core/torch_import.py``; outputs must match to <1e-5 (BASELINE.md).
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.torch_import import import_torch_state_dict
from diffuncertainty_tpu.models.unet import DiffUnet, DropoutSpec


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
    import importlib.util

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


CONFIGS = {
    "plain": dict(
        in_channels=3, out_channels=2, model_channels=8,
        num_res_blocks=[1, 1], num_middle_res_blocks=1,
        attention_resolutions=[], channel_mult=(1, 2), num_heads=2,
    ),
    "attention": dict(
        in_channels=3, out_channels=2, model_channels=8,
        num_res_blocks=[1, 2], num_middle_res_blocks=2,
        attention_resolutions=[-1], channel_mult=(1, 2), num_heads=2,
    ),
    "unet16_like": dict(
        in_channels=3, out_channels=2, model_channels=16,
        num_res_blocks=[2, 2, 2], num_middle_res_blocks=2,
        attention_resolutions=[-2, -1], channel_mult=(1, 2, 4), num_heads=4,
    ),
    "scale_shift": dict(
        in_channels=3, out_channels=2, model_channels=8,
        num_res_blocks=[1, 1], num_middle_res_blocks=1,
        attention_resolutions=[-1], channel_mult=(1, 2), num_heads=2,
        use_scale_shift_norm=True, diffusion=True,
    ),
    "diffusion": dict(
        in_channels=5, out_channels=2, model_channels=8,
        num_res_blocks=[1, 1], num_middle_res_blocks=1,
        attention_resolutions=[-1], channel_mult=(1, 2), num_heads=2,
        diffusion=True,
    ),
    "new_upsample": dict(
        in_channels=3, out_channels=2, model_channels=8,
        num_res_blocks=[1, 1], num_middle_res_blocks=1,
        attention_resolutions=[-1], channel_mult=(1, 2), num_heads=2,
        new_upsample_method=True, one_skip_per_reso=True,
    ),
}


def _randomize_torch(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def _flax_from_cfg(cfg: dict) -> DiffUnet:
    kw = dict(cfg)
    kw["num_res_blocks"] = tuple(kw["num_res_blocks"])
    kw["attention_resolutions"] = tuple(kw["attention_resolutions"])
    kw["dropout_spec"] = DropoutSpec()
    return DiffUnet(**kw)


@pytest.mark.parametrize("name", list(CONFIGS.keys()))
def test_forward_parity(ref_module, name):
    import torch

    cfg = CONFIGS[name]
    torch_model = ref_module.DiffUnet(**cfg).eval()
    _randomize_torch(torch_model, seed=hash(name) % 1000)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    flax_model = _flax_from_cfg(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, cfg["in_channels"])).astype(np.float32)
    t = rng.random(2).astype(np.float32) if cfg.get("diffusion") else None

    init_args = (jnp.asarray(x),) + ((jnp.asarray(t),) if t is not None else ())
    params = flax_model.init(jax.random.key(0), *init_args)
    params = import_torch_state_dict(flax_model, params, state)

    with torch.no_grad():
        targs = (torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),)
        if t is not None:
            targs += (torch.from_numpy(t),)
        ref_out = torch_model(*targs).numpy()

    out = flax_model.apply(params, *init_args)
    got = np.transpose(np.asarray(out.logits), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref_out, atol=1e-5, rtol=1e-4)


def test_ssn_parity(ref_module):
    import torch

    cfg = dict(
        in_channels=3, out_channels=2, model_channels=8,
        num_res_blocks=[1, 1], num_middle_res_blocks=1,
        attention_resolutions=[-1], channel_mult=(1, 2), num_heads=2,
        ssn=True, ssn_rank=4,
    )
    torch_model = ref_module.DiffUnet(**cfg).eval()
    _randomize_torch(torch_model, seed=3)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    flax_model = _flax_from_cfg(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    params = flax_model.init(jax.random.key(0), jnp.asarray(x))
    params = import_torch_state_dict(flax_model, params, state)

    with torch.no_grad():
        dist, failed = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = flax_model.apply(params, jnp.asarray(x))

    # mean: torch flattens NCHW (C,H,W); ours flattens NHWC (H,W,C) — compare
    # through the spatial layout
    ref_mean = dist.loc.numpy().reshape(1, 2, 16, 16)
    got_mean = np.asarray(out.ssn_mean).reshape(1, 16, 16, 2).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_mean, ref_mean, atol=1e-5, rtol=1e-4)
    ref_diag = dist.cov_diag.numpy().reshape(1, 2, 16, 16)
    got_diag = np.asarray(out.ssn_cov_diag).reshape(1, 16, 16, 2).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_diag, ref_diag, atol=1e-5, rtol=1e-4)
    # cov factor: torch (N_chw, R); ours (N_hwc, R) — permute rows
    ref_factor = dist.cov_factor.numpy().reshape(1, 2, 16, 16, 4)
    got_factor = (
        np.asarray(out.ssn_cov_factor).reshape(1, 16, 16, 2, 4).transpose(0, 3, 1, 2, 4)
    )
    np.testing.assert_allclose(got_factor, ref_factor, atol=1e-5, rtol=1e-4)


def test_unmapped_keys_raise(ref_module):
    cfg = CONFIGS["plain"]
    torch_model = ref_module.DiffUnet(**cfg)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    state["bogus.weight"] = np.zeros(3, np.float32)
    flax_model = _flax_from_cfg(cfg)
    params = flax_model.init(jax.random.key(0), jnp.ones((1, 16, 16, 3)))
    with pytest.raises(KeyError, match="Unmapped"):
        import_torch_state_dict(flax_model, params, state)


def test_reference_checkpoint_conversion(ref_module, tmp_path):
    """Lightning-style .ckpt -> our orbax checkpoint -> inference forward."""
    import torch

    from diffuncertainty_tpu.core.checkpoint import load_checkpoint
    from diffuncertainty_tpu.models.factory import build_model
    from diffuncertainty_tpu.tools.import_reference_checkpoint import convert

    cfg = CONFIGS["attention"]
    torch_model = ref_module.DiffUnet(**cfg).eval()
    _randomize_torch(torch_model, seed=11)
    state_dict = {f"model.{k}": v for k, v in torch_model.state_dict().items()}
    # EMA copy with slightly different weights
    with torch.no_grad():
        ema_state = {
            f"ema_model.module.{k}": v * 1.01 for k, v in torch_model.state_dict().items()
        }
    state_dict.update(ema_state)
    payload = {
        "state_dict": state_dict,
        "epoch": 7,
        "hyper_parameters": {
            "model": {"cfg": {"MODEL": {
                "IN_CHANNELS": 3, "OUT_CHANNELS": 2, "MODEL_CHANNELS": 8,
                "NUM_RES_BLOCKS": [1, 2], "NUM_MIDDLE_RES_BLOCKS": 2,
                "CHANNEL_MULT": [1, 2], "ATTENTION_RESOLUTIONS": [-1],
            }}},
            "data": {"name": "lidc64", "num_classes": 2, "ignore_index": -1},
        },
    }
    ckpt_file = tmp_path / "ref.ckpt"
    torch.save(payload, ckpt_file)

    out = convert(ckpt_file, tmp_path / "imported")
    state, loaded_cfg, meta = load_checkpoint(out)
    assert meta["epoch"] == 7
    assert loaded_cfg.network.model_channels == 8
    assert "ema_params" in state

    # forward parity through the converted checkpoint
    built = build_model(loaded_cfg)
    # num_heads default differs (cfg uses 2; translate keeps default 4) ->
    # heads don't change params, only the split; match reference by using
    # the same heads as the torch model for the comparison
    import dataclasses as _dc

    flax_model = _dc.replace(built.module, num_heads=cfg["num_heads"])
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = flax_model.apply(state["params"], jnp.asarray(x)).logits
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref_out, atol=1e-5, rtol=1e-4
    )
