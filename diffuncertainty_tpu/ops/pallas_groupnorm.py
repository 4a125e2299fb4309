"""Pallas TPU kernel: fused GroupNorm32 + activation.

GroupNorm -> SiLU precedes nearly every conv in DiffUnet (``ResBlock``,
``AttentionBlock`` norms, output heads), and is memory-bound: XLA executes it
as a reduction pass plus elementwise passes over HBM. This kernel computes
group statistics, normalization, affine, and the activation in one VMEM
residency per batch element: a single HBM read and write of the activation
tensor.

Grid: one program per batch element; the (H*W, C) slab must fit VMEM (true
for every DiffUnet stage at the reference's 64-128px resolutions: the largest
is 128*128*32 fp32 = 2 MB). Statistics are computed in float32 regardless of
input dtype, matching ``ops/norm.py`` / the reference's GroupNorm32.

``fused_group_norm_act`` falls back to the XLA composition off-TPU (and under
``interpret=True`` runs the same kernel through the Pallas interpreter for
CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norm import group_norm_32, num_groups_for


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float, act: str):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups
    xg = x.reshape(hw, groups, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    normed = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = normed.reshape(hw, c) * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(
        jnp.float32
    )
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act != "none":
        raise ValueError(act)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_group_norm_act(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    act: str = "silu",
    eps: float = 1e-5,
    interpret: bool = False,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """GroupNorm32 + activation on (B, H, W, C) (or (B, T, C)) input.

    ``use_pallas`` defaults to explicit opt-in (or ``DIFFUNC_PALLAS=1``):
    Mosaic kernel compiles hang indefinitely through this container's
    remote-compile TPU tunnel (interpret-mode correctness is test-covered;
    flip the default once validated on directly-attached TPUs).
    """
    if use_pallas is None:
        import os

        use_pallas = interpret or os.environ.get("DIFFUNC_PALLAS") == "1"
    if not use_pallas:
        y = group_norm_32(x, scale, bias, eps=eps)
        if act == "silu":
            return jax.nn.silu(y)
        if act == "relu":
            return jax.nn.relu(y)
        return y

    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    x2 = x.reshape(b, hw, c)
    groups = num_groups_for(c)
    kernel = functools.partial(_kernel, groups=groups, eps=eps, act=act)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(orig_shape)
