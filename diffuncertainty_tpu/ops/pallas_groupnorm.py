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


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, c: int, groups: int,
            n_elems: float, eps: float, act: str):
    """One batch element, lane-folded layout.

    ``x_ref[0]`` is ``(HW/f, f*C)`` with fold factor ``f = lanes/C`` chosen by
    the caller so narrow-channel stages (C < 128) fill the 128-lane registers
    instead of padding 4x (the unfolded C=32 slab OOM'd scoped VMEM). Lane
    ``j`` holds channel ``j % c``; the group combine is a static one-hot
    matmul over lanes, so the fold costs nothing. Mosaic rejects the
    (HW, G, C/G) grouping reshape ("unsupported shape cast") — per-lane
    reductions + one-hot dots keep everything in natively-tiled 2D shapes.
    """
    x = x_ref[0].astype(jnp.float32)  # (HW/f, f*C)
    lc = x.shape[1]
    cg = c // groups
    ch_sum = jnp.sum(x, axis=0, keepdims=True)  # (1, f*C); Mosaic dots need 2D
    ch_sq = jnp.sum(x * x, axis=0, keepdims=True)
    lane_group = (jax.lax.broadcasted_iota(jnp.int32, (lc, groups), 0) % c) // cg
    onehot = (lane_group == jax.lax.broadcasted_iota(jnp.int32, (lc, groups), 1)).astype(
        jnp.float32
    )  # (f*C, G)
    hp = jax.lax.Precision.HIGHEST  # MXU default rounds f32 sums to bf16

    def dot(a, b):
        return jnp.dot(a, b, precision=hp, preferred_element_type=jnp.float32)

    g_mean = dot(ch_sum, onehot) / n_elems  # (1, G)
    g_var = jnp.maximum(dot(ch_sq, onehot) / n_elems - g_mean * g_mean, 0.0)
    # broadcast group stats back to lanes via the transposed one-hot
    mean_l = dot(g_mean, onehot.T)  # (1, f*C)
    inv_l = dot(jax.lax.rsqrt(g_var + eps), onehot.T)
    a = inv_l * scale_ref[:].astype(jnp.float32)[None]  # (1, f*C) tiled affine
    b = bias_ref[:].astype(jnp.float32)[None] - mean_l * a
    y = x * a + b
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

    ``use_pallas`` defaults to explicit opt-in (or ``DIFFUNC_PALLAS=1``).
    Validated compiled on a real v5e chip; with the lane-folded layout it
    runs at every DiffUnet stage (the unfolded C=32 slab OOM'd scoped VMEM).
    **Measured round 2: the XLA composition WINS 3-4x at every production
    shape** (e.g. 256x128x128x32 bf16: XLA 0.80 ms vs kernel 2.97; 16x16x256:
    0.15 vs 0.20) — the channel-stat XLA path is already at the HBM roofline
    and pipelines across batch elements, while the one-cell-per-element grid
    serializes. The kernel therefore stays opt-in, kept as the measured
    baseline for any future revisit.
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
    # lane fold: narrow-channel stages fill the 128-lane registers instead of
    # padding (a contiguous row-major reshape — free)
    f = max(1, 128 // c)
    while f > 1 and hw % f:
        f //= 2
    rows, lc = hw // f, f * c
    x2 = x.reshape(b, rows, lc)
    scale_t = jnp.tile(scale, f)
    bias_t = jnp.tile(bias, f)
    groups = num_groups_for(c)
    kernel = functools.partial(_kernel, c=c, groups=groups,
                               n_elems=float(hw * (c // groups)), eps=eps, act=act)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, lc), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, lc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lc,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((lc,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, scale_t, bias_t)
    return out.reshape(orig_shape)
