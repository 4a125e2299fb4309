"""Prediction samplers: stochastic axes as vmapped/scanned JAX axes."""

from .tta import TTAConfig, sample_tta_params, apply_tta, invert_tta
from .sampler import SamplerSpec, SamplerMeta, PredictionStack, make_sampler

__all__ = [
    "TTAConfig",
    "sample_tta_params",
    "apply_tta",
    "invert_tta",
    "SamplerSpec",
    "SamplerMeta",
    "PredictionStack",
    "make_sampler",
]
