"""Metric kernels: Dice, GED, AURC, calibration, AUROC, NCC.

On-device (jnp, jittable): dice / GED — these run inside the fused inference
pipeline. Host-side (numpy): ranking/calibration metrics consumed by the
evaluation layer (AURC, ACE, AUROC, NCC), which operate on small per-image
score vectors.
"""

from .dice import dice_bin, dice_multiclass_micro, soft_dice_loss
from .ged import ged_binary, ged_multiclass
from .aurc import rc_curve_stats, aurc, eaurc

__all__ = [
    "dice_bin",
    "dice_multiclass_micro",
    "soft_dice_loss",
    "ged_binary",
    "ged_multiclass",
    "rc_curve_stats",
    "aurc",
    "eaurc",
]
