"""Integral-image box/ring filters == dense convolution (differential).

The Advanced env's heat/dousing fields use ``multi_box_sums`` /
``ring_kernel_filter`` (XLA lowers single-channel dense convs to O(k^2)
sliding-window work on TPU); the dense ``correlate2d`` stays as the
correctness oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.alexandridis import (
    build_burn_kernel,
    build_dousing_weights,
    burn_kernel_layer_weights,
)
from gymca_tpu.ops.stencil import correlate2d, multi_box_sums, ring_kernel_filter


@pytest.mark.parametrize("radius", [1, 2, 4, 6])
def test_ring_filter_matches_dense_conv(key, radius):
    x = (jax.random.uniform(key, (2, 40, 48)) < 0.15).astype(jnp.float32)
    dense = correlate2d(x, build_burn_kernel(radius))
    fast = ring_kernel_filter(x, burn_kernel_layer_weights(radius))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               rtol=1e-5, atol=1e-7)


def test_dousing_box_decomposition_matches_dense(key):
    x = (jax.random.uniform(key, (3, 32, 32)) < 0.2).astype(jnp.float32)
    fam = 123.0
    dense = correlate2d(x, build_dousing_weights(fam))
    border = 0.0007 * fam * 0.50
    inner = 0.006 * fam * 0.50
    boxes = multi_box_sums(x, (1, 2))
    fast = border * boxes[2] + (inner - border) * boxes[1]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_box_sums_exact_on_large_grid(key):
    """The matmul-cumsum path must not round counts (default TPU matmul
    precision is bf16, which corrupts counts > 2^8 on >=512^2 grids)."""
    x = (jax.random.uniform(key, (512, 512)) < 0.5).astype(jnp.float32)
    got = multi_box_sums(x, (2,))[2]
    xn = np.asarray(x)
    for y, c in [(0, 0), (256, 256), (511, 511), (100, 400)]:
        lo_y, hi_y = max(0, y - 2), min(512, y + 3)
        lo_c, hi_c = max(0, c - 2), min(512, c + 3)
        assert float(got[y, c]) == xn[lo_y:hi_y, lo_c:hi_c].sum(), (y, c)


def test_box_sums_counts_exact(key):
    """Box sums of 0/1 inputs are exact integers (boundary handling incl.)."""
    x = (jax.random.uniform(key, (9, 17)) < 0.5).astype(jnp.float32)
    xn = np.asarray(x)
    boxes = multi_box_sums(x, (1, 3))
    for r in (1, 3):
        got = np.asarray(boxes[r])
        h, w = xn.shape
        for y in (0, 3, h - 1):
            for xx in (0, 5, w - 1):
                lo_y, hi_y = max(0, y - r), min(h, y + r + 1)
                lo_x, hi_x = max(0, xx - r), min(w, xx + r + 1)
                assert got[y, xx] == xn[lo_y:hi_y, lo_x:hi_x].sum(), (r, y, xx)


def test_exp_slope_precompute_matches_inline(key):
    from gymca_tpu.ops.alexandridis import SLOPE_COEFF, AlexandridisCA

    slope = jax.random.normal(key, (4, 6, 3, 3))
    pre = AlexandridisCA.precompute_exp_slope(slope)
    assert pre.shape == (3, 3, 4, 6)
    # stored bf16 (static terrain, DMA-bound kernel): 8-bit mantissa
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(
                np.asarray(pre[i, j]).astype(np.float32),
                np.exp(SLOPE_COEFF * np.asarray(slope[..., i, j])),
                rtol=5e-3,
            )
