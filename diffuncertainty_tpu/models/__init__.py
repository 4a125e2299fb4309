"""Model zoo (C0 backbones + C1 prediction heads + EU methods), all Flax/JAX."""

from .unet import DiffUnet, DropoutSpec, UnetOutput
from .hrnet import HRNet, HRNetSpec
from .prob_unet import ProbUnet, ProbUnetSpec, build_prob_unet
from .diffusion import ContinuousGaussianDiffusion, GammaSchedule
from .factory import BuiltModel, build_model
from . import ssn, swag, subensemble

__all__ = [
    "DiffUnet",
    "DropoutSpec",
    "UnetOutput",
    "HRNet",
    "HRNetSpec",
    "ProbUnet",
    "ProbUnetSpec",
    "build_prob_unet",
    "ContinuousGaussianDiffusion",
    "GammaSchedule",
    "BuiltModel",
    "build_model",
    "ssn",
    "swag",
    "subensemble",
]
