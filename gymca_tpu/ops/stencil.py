"""Shared stencil primitives: shifted-neighbor views and 2-D correlation.

TPU-first building blocks.  The reference gathers per-cell Moore neighborhoods
with a double-vmapped ``lax.dynamic_slice`` (``ca_alexandridis_jax.py:15-38,
332-343``) — an O(H·W) gather per radius that XLA lowers poorly.  Here
neighborhoods are expressed as *shifted whole-grid views* (8 static slices of a
padded grid) and ring kernels as a single ``lax.conv_general_dilated`` over the
fire mask, which XLA tiles directly onto the VPU/MXU.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax.numpy as jnp
from jax import lax

__all__ = ["shift", "neighbor_offsets", "correlate2d", "moore_shifts"]

# The 8 Moore offsets, row-major order (matching a 3x3 kernel scan skipping
# the center).
NEIGHBOR_OFFSETS: Tuple[Tuple[int, int], ...] = tuple(
    (dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if not (dr == 0 and dc == 0)
)


def neighbor_offsets() -> Tuple[Tuple[int, int], ...]:
    return NEIGHBOR_OFFSETS


def shift(grid: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    """Return S with ``S[r, c] = grid[r + dr, c + dc]`` (out-of-bounds -> fill).

    Static shifts compile to pad+slice, which XLA fuses into the consumer.
    """
    h, w = grid.shape[-2], grid.shape[-1]
    pad = [(0, 0)] * (grid.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(grid, pad, constant_values=fill)
    return lax.slice_in_dim(
        lax.slice_in_dim(padded, 1 + dr, 1 + dr + h, axis=-2), 1 + dc, 1 + dc + w,
        axis=-1,
    )


def moore_shifts(grid: jnp.ndarray, fill) -> Iterator[Tuple[Tuple[int, int], jnp.ndarray]]:
    """Yield ``((dr, dc), shifted_grid)`` for the 8 Moore neighbors.

    All 8 views share a single padded copy of the grid.
    """
    h, w = grid.shape[-2], grid.shape[-1]
    pad = [(0, 0)] * (grid.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(grid, pad, constant_values=fill)
    for dr, dc in NEIGHBOR_OFFSETS:
        view = lax.slice_in_dim(
            lax.slice_in_dim(padded, 1 + dr, 1 + dr + h, axis=-2),
            1 + dc,
            1 + dc + w,
            axis=-1,
        )
        yield (dr, dc), view


def correlate2d(grid: jnp.ndarray, kernel: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """2-D cross-correlation with zero padding ("same" output shape).

    ``out[r, c] = sum_{i,j} grid[r + i - R, c + j - R] * kernel[i, j]``

    Accepts (H, W) or (..., H, W) inputs; leading dims are treated as batch.
    Uses ``lax.conv_general_dilated`` so XLA can map it onto the conv units.
    """
    kh, kw = kernel.shape
    batch_shape = grid.shape[:-2]
    h, w = grid.shape[-2:]
    x = grid.reshape((-1, 1, h, w)).astype(dtype)
    k = kernel[::-1, ::-1].astype(dtype)  # conv flips; undo for correlation
    k = k[None, None]
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + (h, w))
