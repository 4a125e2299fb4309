"""Member-folded linear ops: per-member weights as batched MXU matmuls.

An alternative execution strategy for distinct-weight ensemble members (deep
ensembles, SWAG draws, materialized sub-ensembles). The reference runs a
Python loop over models with CPU<->GPU hopping (``test_2D.py:711-727``);
the default JAX translation — ``vmap`` over a stacked parameter pytree —
lowers each convolution to a feature-grouped conv, which the round-2 device
profile measured at 2.7x the conv time of the same FLOPs as plain batched
convs (62% of the stacked-ensemble step vs 57% of a 2.4x-faster
shared-weight step).

**Measured outcome (v5e, 16-member unet16@128 ensemble+TTA, bf16): this
formulation is 6.5x SLOWER end to end than the vmap grouped-conv lowering
(11.2 vs 73.6 img/s) and compiles ~5x slower** — the 9x im2col patch/tap
HBM traffic costs more than the grouped conv's MXU inefficiency saves, and
chunked vmap (``SamplerSpec.member_chunk``) already bounds peak memory. It
is therefore OPT-IN (``SamplerSpec.member_fold``), kept numerically pinned
to the vmap path by tests for regimes where grouped convs degenerate.

Members are folded into the *batch* axis: activations are
``(M*B, H, W, C)`` with member-major row blocks, and every parameterized op
becomes a member-batched matmul:

- conv:  im2col patches ``(M, B*Ho*Wo, kh*kw*Cin)`` x ``(M, kh*kw*Cin, Cout)``
  — contraction depth ``kh*kw*Cin`` (144..2304 here) instead of the grouped
  conv's ``Cin/M``; XLA tiles the M batch dim onto the MXU cleanly.
- dense: ``(M, rows, Cin) x (M, Cin, Cout)``.
- norm affine: per-member ``(M, C)`` scale/bias applied on the reshaped
  ``(M, B, ..., C)`` view.

Everything else in the model (attention over per-row tokens, GroupNorm
statistics, dropout, pooling, resampling) is row-local and needs no member
awareness at all.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def extract_patches(
    x: jnp.ndarray, kh: int, kw: int, stride: int, pad: int
) -> jnp.ndarray:
    """im2col: NHWC ``(R, H, W, C)`` -> ``(R, Ho, Wo, kh*kw*C)``.

    Patch channels are ordered ``(dy, dx, c)`` to match the HWIO kernel
    layout flattened as ``kernel.reshape(kh*kw*Cin, Cout)``.
    """
    r, h, w, c = x.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    slices = []
    for dy in range(kh):
        for dx in range(kw):
            slices.append(
                lax.slice(
                    x,
                    (0, dy, dx, 0),
                    (r, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, c),
                    (1, stride, stride, 1),
                )
            )
    return jnp.concatenate(slices, axis=-1)


# above this many elements, the im2col patch tensor would dominate HBM
# (the 16-member unet16@128px program OOM'd by 0.5G on a 16G chip); switch
# to a sum-of-taps formulation that never materializes patches
_MAX_PATCH_ELEMS = 200_000_000


def member_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    *,
    stride: int = 1,
    pad: int = 0,
) -> jnp.ndarray:
    """Per-member conv on member-major folded rows.

    Args:
        x: ``(M*B, H, W, Cin)`` — row ``r`` belongs to member ``r // B``.
        kernel: ``(M, kh, kw, Cin, Cout)`` stacked HWIO kernels.
        bias: ``(M, Cout)`` or None.
        stride/pad: symmetric stride and padding (torch ``Conv2d(k, p)``).

    Returns:
        ``(M*B, Ho, Wo, Cout)`` in the compute dtype of ``x``/``kernel``.

    Two formulations, picked by patch-buffer size: im2col + one batched
    matmul (deepest contraction, best MXU shape) when the ``(R, Ho, Wo,
    kh*kw*Cin)`` buffer is affordable; otherwise kh*kw shifted batched
    matmuls accumulated in float32 (same math, no patch buffer — used at
    the full-resolution levels where 9x activations would blow HBM).
    """
    m, kh, kw, cin, cout = kernel.shape
    rows = x.shape[0]
    if rows % m != 0:
        raise ValueError(
            f"member_conv2d: folded rows ({rows}) not divisible by member "
            f"count ({m}) — a silent reshape would mix rows across members")
    b = rows // m
    if kh == kw == 1 and stride == 1 and pad == 0:
        ho, wo = x.shape[1], x.shape[2]
        pm = x.reshape(m, b * ho * wo, cin)
        km = kernel.reshape(m, cin, cout)
        y = lax.dot_general(pm, km, (((2,), (1,)), ((0,), (0,))))
        y = y.reshape(m, b, ho, wo, cout)
        if bias is not None:
            y = y + bias[:, None, None, None, :]
        return y.reshape(rows, ho, wo, cout)

    h, w = x.shape[1], x.shape[2]
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    patch_elems = rows * ho * wo * kh * kw * cin

    if patch_elems <= _MAX_PATCH_ELEMS:
        patches = extract_patches(x, kh, kw, stride, pad)
        depth = kh * kw * cin
        pm = patches.reshape(m, b * ho * wo, depth)
        km = kernel.reshape(m, depth, cout)
        y = lax.dot_general(pm, km, (((2,), (1,)), ((0,), (0,))))
    else:
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                tap = lax.slice(
                    x,
                    (0, dy, dx, 0),
                    (rows, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, cin),
                    (1, stride, stride, 1),
                ).reshape(m, b * ho * wo, cin)
                term = lax.dot_general(
                    tap, kernel[:, dy, dx], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                acc = term if acc is None else acc + term
        y = acc.astype(x.dtype)

    y = y.reshape(m, b, ho, wo, cout)
    if bias is not None:
        y = y + bias[:, None, None, None, :]
    return y.reshape(rows, ho, wo, cout)


def member_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None) -> jnp.ndarray:
    """Per-member dense: ``(M*B, ..., Cin) x (M, Cin, Cout)``.

    (The member-folded norm affine lives in ``ops/norm.py::group_norm_32``,
    which accepts ``(M, C)`` scale/bias directly.)
    """
    m, cin, cout = kernel.shape
    rows = x.shape[0]
    if rows % m != 0:
        raise ValueError(
            f"member_dense: folded rows ({rows}) not divisible by member "
            f"count ({m}) — a silent reshape would mix rows across members")
    inner = x.shape[1:-1]
    xm = x.reshape(m, -1, cin)
    y = lax.dot_general(xm, kernel, (((2,), (1,)), ((0,), (0,))))
    if bias is not None:
        y = y + bias[:, None, :]
    return y.reshape((rows,) + inner + (cout,))
