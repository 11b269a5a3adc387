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

__all__ = [
    "shift",
    "neighbor_offsets",
    "correlate2d",
    "moore_shifts",
    "multi_box_sums",
    "ring_kernel_filter",
]

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


def multi_box_sums(x: jnp.ndarray, radii) -> dict:
    """Chebyshev box sums ``{r: sum over the (2r+1)^2 window}`` for several
    radii from ONE 2-D integral image (inclusive cumsum), zero boundary.

    XLA lowers single-channel large-kernel convs pathologically on TPU
    (O(k^2) sliding-window VPU work); a box sum is 4 shifted reads of the
    cumsum regardless of radius, so an R-ring kernel costs O(R) cheap
    whole-grid adds instead of a k x k conv.

    Exact for integer-valued float inputs (counts stay < 2^24).
    Accepts (..., H, W).
    """
    h, w = x.shape[-2], x.shape[-1]
    rmax = max(radii)
    if h >= 128 and w >= 128:
        # 2-D inclusive cumsum as two triangular matmuls (MXU) — the
        # log-step shuffle lowering of lax.cumsum on the lane axis is ~10x
        # slower at these sizes.  Exact: integer-valued f32 accumulates
        # exactly below 2^24.
        lo_h = jnp.tril(jnp.ones((h, h), x.dtype))
        up_w = jnp.triu(jnp.ones((w, w), x.dtype))
        # HIGHEST precision: default TPU matmul rounds f32 inputs to bf16,
        # which corrupts counts > 2^8 (observed at 512^2 grids).
        s = jnp.einsum(
            "ij,...jk,kl->...il", lo_h, x, up_w,
            preferred_element_type=x.dtype,
            precision=lax.Precision.HIGHEST,
        )
    else:
        s = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
    lead = [(0, 0)] * (x.ndim - 2)
    # bottom/right: replicate (no mass beyond the grid); top/left: zeros
    s = jnp.pad(s, lead + [(0, rmax), (0, rmax)], mode="edge")
    s = jnp.pad(s, lead + [(rmax + 1, 0), (rmax + 1, 0)])
    o = rmax + 1

    def at(a: int, b: int):
        return lax.slice_in_dim(
            lax.slice_in_dim(s, o + a, o + a + h, axis=-2), o + b, o + b + w,
            axis=-1,
        )

    return {
        r: at(r, r) - at(-r - 1, r) - at(r, -r - 1) + at(-r - 1, -r - 1)
        for r in radii
    }


def telescoped_box_coeffs(layer_weights) -> tuple:
    """Per-radius box-sum coefficients equivalent to a square-ring kernel:
    ``c_j = w_{j-1} - w_j`` for j < R, ``c_R = w_{R-1}`` (see
    :func:`ring_kernel_filter`)."""
    n = len(layer_weights)
    coeffs = [layer_weights[j - 1] - layer_weights[j] for j in range(1, n)]
    coeffs.append(layer_weights[n - 1])
    return tuple(float(c) for c in coeffs)


def ring_kernel_filter(x: jnp.ndarray, layer_weights) -> jnp.ndarray:
    """Correlate ``x`` with a square-ring kernel: weight ``layer_weights[i]``
    on Chebyshev ring ``i+1`` (ring 1 also covering the center cell).

    Telescopes into box sums:
    ``sum_i w_i * (box_{i+1} - box_i) + w_0 * center
      = sum_{j=1..R-1} (w_{j-1} - w_j) * box_j + w_{R-1} * box_R``.
    Equivalent to ``correlate2d(x, build_burn_kernel-style kernel)`` up to
    float summation order.
    """
    coeffs = telescoped_box_coeffs(layer_weights)
    radii = list(range(1, len(coeffs) + 1))
    boxes = multi_box_sums(x, radii)
    out = coeffs[0] * boxes[1]
    for r in radii[1:]:
        out = out + coeffs[r - 1] * boxes[r]
    return out
