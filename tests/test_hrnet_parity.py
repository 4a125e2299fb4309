"""HRNet output parity vs the reference torch implementation.

The reference module is constructed with an attribute-dict config. Note: the
reference has a real bug — ``HighResolutionNet._make_stage`` calls
``_resolve_stage_dropout``, which is only defined on
``HighResolutionModule`` — so the oracle is shimmed with those two methods
before construction (semantics unchanged).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.core.hrnet_torch_import import import_hrnet_state_dict
from diffuncertainty_tpu.models.hrnet import HRNet, HRNetSpec


class AD(dict):
    __getattr__ = dict.get


@pytest.fixture(scope="module")
def ref_hrnet():
    ref_dir = "/root/reference/uncertainty_modeling/models"
    try:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [ref_dir]
        sys.modules.setdefault("refmodels", pkg)
        spec = importlib.util.spec_from_file_location(
            "refmodels.hrnet_module", f"{ref_dir}/hrnet_module.py"
        )
        hr = importlib.util.module_from_spec(spec)
        sys.modules["refmodels.hrnet_module"] = hr
        spec.loader.exec_module(hr)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference hrnet unavailable: {exc}")
    # shim the reference bug (methods live on HighResolutionModule only)
    hr.HighResolutionNet._resolve_stage_dropout = hr.HighResolutionModule._resolve_stage_dropout
    hr.HighResolutionNet._coerce_branch_dropout = hr.HighResolutionModule._coerce_branch_dropout
    return hr


def _ref_config(w=8, stage1=8, num_modules=(1, 1, 1), num_blocks=1, num_classes=2, ssn=False):
    def stage(n_branches, n_mod):
        return AD(
            NUM_MODULES=n_mod, NUM_BRANCHES=n_branches, BLOCK="BASIC",
            NUM_BLOCKS=[num_blocks] * n_branches,
            NUM_CHANNELS=[w * 2**i for i in range(n_branches)],
            FUSE_METHOD="SUM",
        )

    extra = AD(
        FINAL_CONV_KERNEL=1,
        STAGE1=AD(NUM_MODULES=1, NUM_BRANCHES=1, BLOCK="BOTTLENECK",
                  NUM_BLOCKS=[4], NUM_CHANNELS=[stage1], FUSE_METHOD="SUM"),
        STAGE2=stage(2, num_modules[0]),
        STAGE3=stage(3, num_modules[1]),
        STAGE4=stage(4, num_modules[2]),
    )
    return AD(
        MODEL=AD(ALIGN_CORNERS=False, INPUT_CHANNELS=3, EXTRA=extra,
                 SSN=ssn, SSN_RANK=3, SSN_EPS=1e-5, SWAG=False),
        DATASET=AD(NUM_CLASSES=num_classes),
    )


def _spec(w=8, stage1=8, num_modules=(1, 1, 1), num_blocks=1):
    return HRNetSpec(width=w, stage1_channels=stage1,
                     num_modules=num_modules, num_blocks=num_blocks)


def _randomize_torch(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        # randomize BN running stats so eval-mode parity exercises them
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(1.0 + 0.2 * torch.rand(m.running_var.shape, generator=g))
    return model


@pytest.mark.parametrize("num_modules", [(1, 1, 1), (1, 2, 1)])
def test_hrnet_forward_parity(ref_hrnet, num_modules):
    import torch

    cfg = _ref_config(num_modules=num_modules)
    torch_model = ref_hrnet.HighResolutionNet(cfg).eval()
    _randomize_torch(torch_model, seed=1)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    flax_model = HRNet(num_classes=2, spec=_spec(num_modules=num_modules))
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    variables = flax_model.init(jax.random.key(0), jnp.asarray(x), True)
    variables = import_hrnet_state_dict(flax_model, variables, state)

    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = flax_model.apply(variables, jnp.asarray(x))
    got_nchw = np.transpose(np.asarray(got.logits), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, ref_out, atol=2e-5, rtol=1e-4)


def test_hrnet_ssn_parity(ref_hrnet):
    import torch

    cfg = _ref_config(ssn=True)
    torch_model = ref_hrnet.HighResolutionNet(cfg).eval()
    _randomize_torch(torch_model, seed=2)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    flax_model = HRNet(num_classes=2, spec=_spec(), ssn=True, ssn_rank=3)
    x = np.random.default_rng(1).standard_normal((1, 32, 32, 3)).astype(np.float32)
    variables = flax_model.init(jax.random.key(0), jnp.asarray(x), True)
    variables = import_hrnet_state_dict(flax_model, variables, state)

    with torch.no_grad():
        dist, _ = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = flax_model.apply(variables, jnp.asarray(x))
    ref_mean = dist.loc.numpy().reshape(1, 2, 32, 32)
    got_mean = np.asarray(out.ssn_mean).reshape(1, 32, 32, 2).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_mean, ref_mean, atol=2e-5, rtol=1e-4)
    ref_diag = dist.cov_diag.numpy().reshape(1, 2, 32, 32)
    got_diag = np.asarray(out.ssn_cov_diag).reshape(1, 32, 32, 2).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_diag, ref_diag, atol=2e-5, rtol=1e-4)


def test_hrnet_pretrained_style_tolerant_import(ref_hrnet):
    """strict=False skips mismatched heads like the reference load_weights."""
    import torch

    cfg = _ref_config(num_classes=5)  # pretrained head has 5 classes
    torch_model = ref_hrnet.HighResolutionNet(cfg)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    flax_model = HRNet(num_classes=2, spec=_spec())  # task head has 2
    x = jnp.ones((1, 32, 32, 3))
    variables = flax_model.init(jax.random.key(0), x, True)
    out = import_hrnet_state_dict(flax_model, variables, state, strict=False)
    # backbone transferred, head left at init
    got = flax_model.apply(out, x)
    assert got.logits.shape == (1, 32, 32, 2)
