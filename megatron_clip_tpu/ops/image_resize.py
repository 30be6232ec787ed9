"""Torch-exact separable bicubic resize for learned position-embedding grids.

open_CLIP resizes a pretrained ViT position table to a new grid with
`F.interpolate(mode='bicubic', antialias=True, align_corners=False)`
(open_CLIP/src/open_clip/model.py:417-448 resize_pos_embed). JAX's
`jax.image.resize(method='cubic')` uses a different cubic kernel
(Keys a=-0.5 with its own antialias windowing), so checkpoints resized here
would diverge from the same checkpoint resized by the reference. This module
reproduces torch's two kernels bit-for-bit (verified <=1e-15 vs torch):

  - antialias=True  (torch's PIL-compatible path, the reference default):
    cubic a=-0.5; when downscaling the kernel is stretched by the scale
    factor; the tap window is truncated at the edges and renormalized.
  - antialias=False (classic bicubic): cubic a=-0.75, 4 taps, edge taps
    clamped (accumulated) onto the border pixels.

Both reduce to a per-axis weight matrix [out, in] built in numpy at trace
time; the resize itself is two dense matmuls — MXU-friendly and jit-safe
(static shapes, no gather).
"""
import numpy as np
import jax.numpy as jnp


def _cubic(x, a):
    x = np.abs(x)
    return np.where(
        x <= 1, ((a + 2) * x - (a + 3)) * x * x + 1,
        np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))


def resize_weight_matrix(in_size: int, out_size: int,
                         antialias: bool = True) -> np.ndarray:
    """Per-axis resize weights W [out_size, in_size]: out = W @ in."""
    scale = in_size / out_size
    W = np.zeros((out_size, in_size))
    if antialias:
        kscale = max(scale, 1.0)
        support = 2.0 * kscale
        for i in range(out_size):
            center = (i + 0.5) * scale - 0.5
            lo = int(np.floor(center - support + 0.5))
            hi = int(np.ceil(center + support + 0.5))
            idx = np.arange(lo, hi)
            w = _cubic((idx - center) / kscale, -0.5)
            m = (idx >= 0) & (idx < in_size)
            idx, w = idx[m], w[m]
            W[i, idx] = w / w.sum()
    else:
        for i in range(out_size):
            center = (i + 0.5) * scale - 0.5
            base = int(np.floor(center))
            idx = np.arange(base - 1, base + 3)
            w = _cubic(idx - center, -0.75)
            w = w / w.sum()
            np.add.at(W[i], np.clip(idx, 0, in_size - 1), w)
    return W


def resize_grid_bicubic(grid, out_h: int, out_w: int, antialias: bool = True):
    """grid [H, W, C] -> [out_h, out_w, C], torch F.interpolate semantics
    (align_corners=False). Accepts numpy or jax arrays; returns jnp."""
    grid = jnp.asarray(grid, jnp.float32)
    h, w, _ = grid.shape
    Wh = jnp.asarray(resize_weight_matrix(h, out_h, antialias), jnp.float32)
    Ww = jnp.asarray(resize_weight_matrix(w, out_w, antialias), jnp.float32)
    tmp = jnp.einsum("hjc,oj->hoc", grid, Ww)
    return jnp.einsum("hoc,ph->poc", tmp, Wh)
