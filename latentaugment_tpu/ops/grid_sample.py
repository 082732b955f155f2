"""Bilinear grid sampling (parity: reference ops/grid_sample_gradfix.py:28-82
plus the padding modes the kornia-based GeometricAugment relies on).

`grid` follows the torch convention: [N, H_out, W_out, 2] with (x, y)
coordinates in [-1, 1]. align_corners=False maps -1/+1 to the outer
pixel edges. Implemented as a gather + lerp in pure jnp; XLA autodiff
supplies first- and second-order gradients (the reference needed a
custom autograd pair for that).
"""

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x, lo, hi):
    """Reflect coordinates into [lo, hi] (torch 'reflection' padding)."""
    rng = hi - lo
    if rng <= 0:
        return jnp.zeros_like(x) + lo
    x = jnp.abs(x - lo) % (2 * rng)
    return lo + jnp.where(x > rng, 2 * rng - x, x)


def grid_sample(x, grid, padding_mode='zeros', align_corners=False):
    """Sample NCHW `x` at `grid` locations with bilinear interpolation.

    padding_mode: 'zeros' | 'border' | 'reflection'.
    Returns [N, C, H_out, W_out].
    """
    n, c, h, w = x.shape
    gx = _unnormalize(grid[..., 0], w, align_corners)  # [N, Ho, Wo]
    gy = _unnormalize(grid[..., 1], h, align_corners)

    if padding_mode == 'reflection':
        if align_corners:
            gx = _reflect(gx, 0.0, w - 1)
            gy = _reflect(gy, 0.0, h - 1)
        else:
            gx = _reflect(gx, -0.5, w - 0.5)
            gy = _reflect(gy, -0.5, h - 0.5)
        gx = jnp.clip(gx, 0, w - 1)
        gy = jnp.clip(gy, 0, h - 1)
    elif padding_mode == 'border':
        gx = jnp.clip(gx, 0, w - 1)
        gy = jnp.clip(gy, 0, h - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1
    y1 = y0 + 1
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        """Fetch x[n, :, iy, ix] with zero outside; returns [N, C, Ho, Wo]."""
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(n, c, h * w)
        idx = iyc * w + ixc  # [N, Ho, Wo]
        idx2 = idx.reshape(n, -1)  # [N, Ho*Wo]
        vals = jnp.take_along_axis(flat, idx2[:, None, :], axis=2)  # [N, C, Ho*Wo]
        vals = vals.reshape(n, c, *ix.shape[1:])
        if padding_mode == 'zeros':
            vals = vals * valid[:, None].astype(vals.dtype)
        return vals

    out = (gather(x0, y0) * (wx0 * wy0)[:, None]
           + gather(x1, y0) * (wx1 * wy0)[:, None]
           + gather(x0, y1) * (wx0 * wy1)[:, None]
           + gather(x1, y1) * (wx1 * wy1)[:, None])
    return out.astype(x.dtype)
