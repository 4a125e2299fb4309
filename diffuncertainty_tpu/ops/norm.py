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

    ``scale``/``bias`` are ``(C,)``, or ``(M, C)`` for member-folded rows
    (``ops/member_fold.py``): batch rows are M member-major blocks and each
    block gets its member's affine.
    """
    c = x.shape[-1]
    groups = num_groups_for(c) if num_groups is None else num_groups
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    batch = x.shape[0]
    spatial_axes = tuple(range(1, xf.ndim - 1))
    n_spatial = 1
    for d in x.shape[1:-1]:
        n_spatial *= d
    cpg = c // groups

    # Reduce to per-channel sums first (layout-friendly: no reshape of the
    # big activation into a (B, HW, G, C/G) tensor, whose 2-wide minor axis
    # tiled terribly and cost ~25% of the round-2 inference profile), then
    # combine channel stats into group stats on the tiny (B, C) tensor.
    # One fused pass computes sum and sum-of-squares together.
    ch_sum = jnp.sum(xf, axis=spatial_axes)  # (B, C)
    ch_sumsq = jnp.sum(xf * xf, axis=spatial_axes)
    g_sum = jnp.sum(ch_sum.reshape(batch, groups, cpg), axis=-1)  # (B, G)
    g_sumsq = jnp.sum(ch_sumsq.reshape(batch, groups, cpg), axis=-1)
    n = float(n_spatial * cpg)
    g_mean = g_sum / n
    g_var = jnp.maximum(g_sumsq / n - g_mean * g_mean, 0.0)

    # per-channel affine folded with the group stats: out = x*a + b
    inv = lax.rsqrt(g_var + eps)  # (B, G)
    inv_c = jnp.repeat(inv, cpg, axis=-1)  # (B, C)
    mean_c = jnp.repeat(g_mean, cpg, axis=-1)
    scale_f = scale.astype(jnp.float32)
    bias_f = bias.astype(jnp.float32)
    if scale_f.ndim == 2:  # (M, C) member-folded affine
        m = scale_f.shape[0]
        if batch % m != 0:
            raise ValueError(
                f"group_norm_32: folded rows ({batch}) not divisible by "
                f"member count ({m}) — a silent repeat would misalign "
                "member affines across rows")
        scale_f = jnp.repeat(scale_f, batch // m, axis=0)  # (B, C)
        bias_f = jnp.repeat(bias_f, batch // m, axis=0)
    a = inv_c * scale_f  # (B, C)
    b = bias_f - mean_c * a
    bshape = (batch,) + (1,) * len(spatial_axes) + (c,)
    out = xf * a.reshape(bshape) + b.reshape(bshape)
    return out.astype(orig_dtype)
