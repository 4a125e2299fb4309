"""TPU-native array ops: norms, attention, resampling, warps, entropy kernels.

These replace the cuDNN kernels the reference invoked implicitly through
PyTorch; numerics are matched op-by-op against ``torch`` CPU in tests.
"""

from .norm import group_norm_32, num_groups_for
from .time_embed import timestep_embedding
from .attention import qkv_attention
from .resample import upsample2x, downsample_avgpool2x
from .entropy import uncertainty_heatmaps, one_minus_msr

__all__ = [
    "group_norm_32",
    "num_groups_for",
    "timestep_embedding",
    "qkv_attention",
    "upsample2x",
    "downsample_avgpool2x",
    "uncertainty_heatmaps",
    "one_minus_msr",
]
