"""Rotary position embeddings.

Replaces megatron's RotaryEmbedding / apply_rotary_pos_emb
(megatron/core/models/common/embeddings/rotary_pos_embedding.py) with the
rotate-half convention. Frequencies are computed once per (seq, head_dim)
and broadcast; everything stays static-shaped for XLA.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_cos_sin(seq_len: int, head_dim: int, theta: float = 10000.0,
                 offset: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Returns (cos, sin), each [seq_len, head_dim]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    pos = np.arange(offset, offset + seq_len)
    freqs = np.einsum("s,d->sd", pos, inv_freq)            # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)          # [S, D]
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """x: [B, H, S, D]; cos/sin: [S, D] shared, or [B, S, D] per-row
    positions (ragged-prompt decode)."""
    if cos.ndim == 3:
        cos = cos.astype(x.dtype)[:, None]
        sin = sin.astype(x.dtype)[:, None]
    else:
        cos = cos.astype(x.dtype)[None, None]
        sin = sin.astype(x.dtype)[None, None]
    return x * cos + rotate_half(x) * sin


def apply_rope_bshd(x, cos, sin):
    """x: [B, S, H, D]; cos/sin: [S, D]."""
    cos = cos.astype(x.dtype)[None, :, None, :]
    sin = sin.astype(x.dtype)[None, :, None, :]
    return x * cos + rotate_half(x) * sin
