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
                 offset: int = 0, rotary_percent: float = 1.0,
                 seq_len_interpolation_factor: float = None,
                 ) -> Tuple[jax.Array, jax.Array]:
    """Returns (cos, sin), each [seq_len, rot_dim].

    rotary_percent < 1 rotates only the first head_dim*percent channels
    (megatron --rotary-percent, rotary_pos_embedding.py: `dim * percent`);
    apply_rope passes the remaining channels through untouched.
    seq_len_interpolation_factor divides positions (megatron
    --rotary-seq-len-interpolation-factor: linear position interpolation
    for context extension).

    Built from traced jnp ops, not host numpy: a numpy table would be
    captured as a hoisted constant buffer of the surrounding jit, and
    jax 0.9's C++ fastpath loses hoisted consts of donated pipelined steps
    on the second run in a process (XLA constant-folds these ops into the
    executable instead)."""
    rot_dim = int(head_dim * rotary_percent)
    rot_dim -= rot_dim % 2
    # lax.iota, not jnp.arange: arange with static bounds materializes a
    # concrete array even under a trace (a captured const); iota stays a
    # traced op
    inv_freq = 1.0 / (theta ** (2.0 * jax.lax.iota(jnp.float32, rot_dim // 2)
                                / rot_dim))
    pos = jax.lax.iota(jnp.float32, seq_len) + float(offset)
    if seq_len_interpolation_factor is not None:
        pos = pos / float(seq_len_interpolation_factor)
    freqs = pos[:, None] * inv_freq[None, :]               # [S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)         # [S, D]
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """x: [B, H, S, D]; cos/sin: [S, R] shared, or [B, S, R] per-row
    positions (ragged-prompt decode). R < D (partial rotary,
    --rotary-percent) leaves channels R: untouched."""
    rot_dim = cos.shape[-1]
    x, rest = x[..., :rot_dim], x[..., rot_dim:]
    if cos.ndim == 3:
        cos = cos.astype(x.dtype)[:, None]
        sin = sin.astype(x.dtype)[:, None]
    else:
        cos = cos.astype(x.dtype)[None, None]
        sin = sin.astype(x.dtype)[None, None]
    out = x * cos + rotate_half(x) * sin
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


def apply_rope_bshd(x, cos, sin):
    """x: [B, S, H, D]; cos/sin: [S, R] shared or [B, S, R] per-row
    positions (--reset-position-ids document restarts), R <= D (see
    apply_rope)."""
    rot_dim = cos.shape[-1]
    x, rest = x[..., :rot_dim], x[..., rot_dim:]
    if cos.ndim == 3:
        cos = cos.astype(x.dtype)[:, :, None, :]
        sin = sin.astype(x.dtype)[:, :, None, :]
    else:
        cos = cos.astype(x.dtype)[None, :, None, :]
        sin = sin.astype(x.dtype)[None, :, None, :]
    out = x * cos + rotate_half(x) * sin
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out
