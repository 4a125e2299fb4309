"""QKV self-attention with the ADM "legacy" head split.

Matches ``uncertainty_modeling/models/diff_unet2D_module.py:803-822``: the
fused qkv projection produces channels ``[q(C) | k(C) | v(C)]`` which are
first reshaped to ``heads x (3C/heads)`` and *then* split into q/k/v of
``C/heads`` channels each — i.e. head h reads global channels
``[h*3C/H, h*3C/H + C/H)`` for q, etc. Scaling is the numerically-stable
``1/sqrt(sqrt(ch))`` applied to both q and k before the product, and the
softmax is computed in float32.

Token counts in this model family are small (<= 1024 for 128px inputs at the
attended resolutions), so a plain XLA einsum formulation maps cleanly onto the
MXU; a Pallas flash kernel would only pay off for much longer sequences.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def qkv_attention(
    qkv: jnp.ndarray, num_heads: int, precision=None
) -> jnp.ndarray:
    """Apply legacy-split QKV attention.

    Args:
        qkv: ``(B, T, 3C)`` fused projections, token-major (NHWC-flattened).
        num_heads: number of attention heads; ``C % num_heads == 0``.
        precision: matmul precision. float32 inputs default to HIGHEST so TPU
            MXU bf16-pass decomposition doesn't break <1e-5 parity; bf16
            inputs use the fast default.

    Returns:
        ``(B, T, C)`` attention output.
    """
    if precision is None and qkv.dtype == jnp.float32:
        precision = lax.Precision.HIGHEST
    b, t, c3 = qkv.shape
    c = c3 // 3
    ch = c // num_heads
    # (B, T, H, 3*ch): the trailing 3C axis is split head-major, matching the
    # torch ``view(b*heads, 3c//heads, T)`` on a channel-major tensor.
    qkv_h = qkv.reshape(b, t, num_heads, 3 * ch)
    q = qkv_h[..., 0 * ch : 1 * ch]
    k = qkv_h[..., 1 * ch : 2 * ch]
    v = qkv_h[..., 2 * ch : 3 * ch]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(ch, dtype=jnp.float32)))
    scale = scale.astype(qkv.dtype)

    from .pallas_attention import pallas_attention_usable, qkv_attention_fused

    if pallas_attention_usable(t, qkv.dtype):
        # VMEM-resident single-block kernel reading (T, ch) head tiles
        # straight out of the fused projection: no HBM score matrix, no
        # transpose glue. ch is static, so the scale is a python float.
        return qkv_attention_fused(qkv, num_heads, float(ch) ** -0.25)

    # weight[b,h,t,s] = sum_c q[b,t,h,c] k[b,s,h,c]
    weight = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale, precision=precision)
    weight = jax_nn_softmax_f32(weight)
    out = jnp.einsum("bhts,bshc->bthc", weight, v, precision=precision)
    return out.reshape(b, t, c)


def jax_nn_softmax_f32(w: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis computed in float32, cast back to input dtype."""
    orig = w.dtype
    wf = w.astype(jnp.float32)
    wf = wf - jnp.max(wf, axis=-1, keepdims=True)
    e = jnp.exp(wf)
    out = e / jnp.sum(e, axis=-1, keepdims=True)
    return out.astype(orig)
