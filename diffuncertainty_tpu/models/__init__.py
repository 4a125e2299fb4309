"""Model zoo (C0 backbones + C1 prediction heads), all Flax/JAX."""

from .unet import DiffUnet, DropoutSpec, UnetOutput

__all__ = ["DiffUnet", "DropoutSpec", "UnetOutput"]
