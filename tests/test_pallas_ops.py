"""Pallas kernel correctness (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.ops.norm import group_norm_32
from diffuncertainty_tpu.ops.pallas_groupnorm import fused_group_norm_act


@pytest.mark.parametrize("channels", [32, 48, 64])
@pytest.mark.parametrize("act", ["silu", "relu", "none"])
def test_fused_groupnorm_matches_xla(rng, channels, act):
    x = jnp.asarray(rng.standard_normal((2, 6, 6, channels)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(channels), jnp.float32)
    b = jnp.asarray(rng.standard_normal(channels), jnp.float32)
    got = fused_group_norm_act(x, s, b, act=act, interpret=True)
    ref = group_norm_32(x, s, b)
    if act == "silu":
        ref = jax.nn.silu(ref)
    elif act == "relu":
        ref = jax.nn.relu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_groupnorm_token_layout(rng):
    """(B, T, C) token-major input (attention norm)."""
    x = jnp.asarray(rng.standard_normal((3, 49, 32)), jnp.float32)
    s = jnp.ones(32)
    b = jnp.zeros(32)
    got = fused_group_norm_act(x, s, b, act="none", interpret=True)
    ref = group_norm_32(x, s, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_xla_fallback_path(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 32)), jnp.float32)
    s = jnp.ones(32)
    b = jnp.zeros(32)
    got = fused_group_norm_act(x, s, b, act="silu", use_pallas=False)
    ref = jax.nn.silu(group_norm_32(x, s, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_qkv_attention_fused_matches_xla(rng):
    """The fused-qkv single-block kernel (BlockSpec head slicing, scale^2 on
    f32 scores) matches the XLA legacy-split attention."""
    import jax
    import jax.numpy as jnp

    from diffuncertainty_tpu.ops.attention import qkv_attention
    from diffuncertainty_tpu.ops.pallas_attention import qkv_attention_fused

    b, t, c, heads = 2, 64, 64, 4
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * c)), jnp.float32)
    ref = qkv_attention(qkv, heads)
    got = qkv_attention_fused(qkv, heads, float(c // heads) ** -0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_qkv_attention_xla_twin_and_grads(rng):
    """The XLA twin used for the kernel's custom_vjp backward matches
    qkv_attention exactly, value and gradient (so bf16 training through the
    Pallas forward differentiates correctly)."""
    import jax
    import jax.numpy as jnp

    from diffuncertainty_tpu.ops.attention import qkv_attention
    from diffuncertainty_tpu.ops.pallas_attention import _xla_qkv_attention

    b, t, c, heads = 2, 32, 64, 4
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * c)), jnp.float32)
    scale = float(c // heads) ** -0.25
    np.testing.assert_allclose(
        np.asarray(_xla_qkv_attention(qkv, heads, scale)),
        np.asarray(qkv_attention(qkv, heads)), atol=1e-5)
    g1 = jax.grad(lambda x: jnp.sum(_xla_qkv_attention(x, heads, scale) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(qkv_attention(x, heads) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
