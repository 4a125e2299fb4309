"""Group normalization with float32 internals (reference ``GroupNorm32``).

Matches ``uncertainty_modeling/models/diff_unet2D_module.py:63-77``:
``num_groups = 32`` when the channel count is divisible by 32, otherwise one
group per channel; statistics are computed in float32 and the result cast back
to the input dtype. Layout is NHWC (TPU-native), channels last.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def num_groups_for(num_channels: int) -> int:
    return 32 if num_channels % 32 == 0 else num_channels


def group_norm_32(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over the trailing channel axis of an ``(B, ..., C)`` array.

    Statistics are taken over all spatial positions and the channels within a
    group (the same reduction set as ``torch.nn.GroupNorm`` on NCHW).
    """
    c = x.shape[-1]
    groups = num_groups_for(c) if num_groups is None else num_groups
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    batch = x.shape[0]
    spatial = x.shape[1:-1]
    # (B, prod(spatial), groups, C/groups): stats per (batch, group)
    xg = xf.reshape(batch, -1, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    xf = xg.reshape(batch, *spatial, c)
    xf = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)
