"""Single-block VMEM-resident attention kernel (Pallas/Mosaic).

The DiffUnet attends at <=1024 tokens with head_dim 32 (unet16 @128px:
(B*members, heads=4, T=1024, d=32)). The XLA path materializes the (T, T)
score matrix in HBM — ~2.1 GB per layer for the fused 256-row inference
batch, making attention bandwidth-bound (~31% of the round-2 bf16 profile).
Generic flash attention is the wrong tool here: its head-dim padding to the
128-lane register width wastes 4x on d=32, and measured 2.6x *slower* than
the materialized XLA path on this shape.

Instead, one grid cell computes one (batch, head) attention entirely in
VMEM: q/k/v tiles are 64 KB each (bf16), the f32 score block is 4 MB — all
well under the ~16 MB v5e VMEM budget. HBM traffic drops from ~4.5 GB to
~260 MB per layer (read q,k,v + write out), leaving only the inherent
25%-MXU qk contraction (depth 32).

Numerics match ``ops/attention.py``: scores accumulate in f32
(``preferred_element_type``), softmax in f32, PV in the input dtype.
Differentiation goes through a pure-XLA twin via ``jax.custom_vjp``
(pallas_call has no autodiff rule), so bf16 *training* works too.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Mosaic compiles hung through the remote-compile tunnel in round 1; they
# work as of round 2, but keep an escape hatch.
_DISABLED = os.environ.get("DIFFUNC_NO_PALLAS_ATTN") == "1"
_MAX_TOKENS = 2048  # single-block design: the f32 score tile must fit VMEM


def _qkv_kernel(qkv_ref, o_ref, *, num_heads: int, ch: int, scale2: float,
                rows: int = 1):
    # ``rows`` batch rows per cell; heads statically unrolled (score tile
    # reused). Everything stays 2-D — Mosaic rejects 3-D/4-D squeezes and
    # grouping reshapes ("unsupported shape cast"); plain lane slices lower
    # fine. The softmax denominator divides the (T, d) PV *output*, not the
    # (T, T) probability tile — same math, one full score-tile elementwise
    # pass fewer (measured -13% at T=1024, v5e). Multi-row cells amortize
    # per-cell DMA/pipeline overhead where the score tile is small
    # (measured -32% at T=256; Mosaic runs out of VMEM at T=1024).
    for r in range(rows):
        x = qkv_ref[r]  # (T, 3C), channel layout [h0: q|k|v, h1: q|k|v, ...]
        for h in range(num_heads):
            base = 3 * ch * h
            q = x[:, base : base + ch]
            k = x[:, base + ch : base + 2 * ch]
            v = x[:, base + 2 * ch : base + 3 * ch]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale2  # scale after the f32 accumulation (better than bf16 q*scale)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)  # (T, 1) f32
            o = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[r, :, ch * h : ch * (h + 1)] = (o / denom).astype(o_ref.dtype)


def _xla_qkv_attention(qkv: jnp.ndarray, num_heads: int, scale: float) -> jnp.ndarray:
    """Pure-XLA twin of the kernel (same math) — used for the backward pass."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    qkv_h = qkv.reshape(b, t, num_heads, 3 * ch)
    q = qkv_h[..., :ch]
    k = qkv_h[..., ch : 2 * ch]
    v = qkv_h[..., 2 * ch :]
    w = jnp.einsum("bthc,bshc->bhts", q, k,
                   preferred_element_type=jnp.float32) * (scale ** 2)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    e = jnp.exp(w)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
    out = jnp.einsum("bhts,bshc->bthc", p, v)
    return out.reshape(b, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv_attention_pallas(qkv, num_heads, scale):
    return _qkv_attention_pallas_impl(qkv, num_heads, scale)


def _qkv_attention_pallas_fwd(qkv, num_heads, scale):
    return _qkv_attention_pallas_impl(qkv, num_heads, scale), qkv


def _qkv_attention_pallas_bwd(num_heads, scale, qkv, g):
    # pallas_call has no autodiff rule; differentiate the XLA twin instead
    # (training recomputes the scores — the standard attention-bwd tradeoff)
    _, vjp = jax.vjp(lambda x: _xla_qkv_attention(x, num_heads, scale), qkv)
    return vjp(g)


_qkv_attention_pallas.defvjp(_qkv_attention_pallas_fwd, _qkv_attention_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def qkv_attention_fused(
    qkv: jnp.ndarray, num_heads: int, scale: float, *, interpret: bool = False
) -> jnp.ndarray:
    """Attention straight off the fused (B, T, 3C) qkv projection.

    The ADM legacy head split keeps head h's packed q|k|v contiguous at
    channels [3ch*h, 3ch*(h+1)), so the kernel slices heads by lane offset
    straight out of the projection — no transpose/reshape glue (which cost
    more device time than the kernel itself in the round-2 profile).
    ``scale`` is the reference's per-operand 1/sqrt(sqrt(ch)); applied as
    scale^2 on the f32-accumulated scores.
    """
    if interpret:
        return _qkv_attention_pallas_impl(qkv, num_heads, scale, interpret=True)
    return _qkv_attention_pallas(qkv, num_heads, float(scale))


def _qkv_attention_pallas_impl(qkv, num_heads, scale, interpret=False):
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    # small score tiles leave VMEM headroom for multi-row cells (amortized
    # per-cell overhead); at T=1024 the f32 score tile alone is 4 MB and a
    # second row fails Mosaic allocation
    rows = 2 if (t <= 256 and b % 2 == 0) else 1
    kernel = functools.partial(
        _qkv_kernel, num_heads=num_heads, ch=ch, scale2=float(scale) ** 2,
        rows=rows,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=[pl.BlockSpec((rows, t, 3 * c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        interpret=interpret,
    )(qkv)


def pallas_attention_usable(t: int, dtype) -> bool:
    """Gate: TPU backend, bf16 inputs (the fp32 path keeps HIGHEST-precision
    XLA dots for <1e-5 reference parity), token count within the
    single-block budget, not disabled."""
    if _DISABLED or t > _MAX_TOKENS:
        return False
    if dtype != jnp.bfloat16:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
