"""Sinusoidal timestep embeddings.

Matches ``uncertainty_modeling/models/diff_unet2D_module.py:43-61`` exactly,
including the unusual ``max_period=10`` default (continuous t in [0, 1], not
integer DDPM steps) and the cos-before-sin concatenation order.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10.0
) -> jnp.ndarray:
    """Embed a ``(B,)`` vector of (possibly fractional) timesteps to ``(B, dim)``."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
