"""Fused Pallas TPU kernel for the Alexandridis wildfire CA.

Performance-mode counterpart of :class:`gymca_tpu.ops.alexandridis.
AlexandridisCA` (reference ``ca_alexandridis_jax.py:321-424``): one grid
program updates one env's full lattice in a single VMEM pass —

    heat (ring kernel)  = banded-ones matmuls on the MXU (box sums of the
                          fire mask are exact in bf16: counts <= 169)
    dousing retardant   = two more banded matmuls on the dousing counts
    burn probability    = (heat - dousing) * veg_den_factor * wind_d *
                          exp_slope_d per direction
    ignition            = ONE in-kernel PRNG uniform per cell vs the
                          complement product 1 - prod(1 - p_d)
    rule cascade        = ignition / burnout selects + fire-age update with
                          in-kernel sampled ages

RNG comes from the per-core Pallas PRNG seeded per (env, step), so this path
is *distributionally* equivalent to the XLA path, not bit-identical — the
XLA implementation remains canonical and is used for differential testing of
every deterministic sub-behavior (no-fire fixpoint, forced/blocked ignition,
burnout timing, age bounds); see ``tests/test_pallas_alexandridis.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gymca_tpu.ops.stencil import NEIGHBOR_OFFSETS

__all__ = ["alexandridis_fused_step", "supports_fused_alexandridis",
           "build_banded_ones"]

_INV_2_24 = float(2.0 ** -24)


def _uniform_01(shape):
    """U[0,1) from the Pallas PRNG (24 high bits -> f32).  Bitcast to uint32
    first: a signed shift would produce negative values."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic can't cast uint32->f32; the >>8 result fits int32 (< 2^24).
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV_2_24


def build_banded_ones(n: int, n_bands: int) -> jnp.ndarray:
    """(n_bands, n, n) bf16 stack of banded-ones matrices: plane ``r-1`` is 1
    where ``|i - j| <= r``.  bf16 is exact here (values 0/1) and the box
    COUNTS they produce stay exact too (<= 169 < 2^8 mantissa) while running
    the MXU at its fast bf16 rate.  Built once on the XLA side and streamed
    to every grid program (the pipeline elides the re-fetch: the block index
    is constant)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = jnp.abs(ii - jj)
    return jnp.stack(
        [(d <= r).astype(jnp.bfloat16) for r in range(1, n_bands + 1)]
    )


def _box(x16, d_rows16, d_cols16):
    """Chebyshev box sum via two banded bf16 matmuls (zero boundary exact,
    f32 accumulation)."""
    t = jax.lax.dot_general(
        d_rows16, x16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(
        t.astype(jnp.bfloat16), d_cols16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _shift2d(g, dr: int, dc: int, fill, rows, cols):
    """S[r, c] = g[r + dr, c + dc] with edge fill (Mosaic rolls + masks)."""
    h, w = g.shape
    out = g
    valid = None
    if dr != 0:
        out = pltpu.roll(out, (-dr) % h, 0)
        valid = (rows < h - 1) if dr == 1 else (rows >= 1)
    if dc != 0:
        out = pltpu.roll(out, (-dc) % w, 1)
        v = (cols < w - 1) if dc == 1 else (cols >= 1)
        valid = v if valid is None else (valid & v)
    return jnp.where(valid, out, fill)


def _alexandridis_kernel(
    grid_ref,  # (1, H, W) int8 — cells fit a byte; the kernel is DMA-bound
    age_ref,  # (1, H, W) f32
    dous_ref,  # (1, H, W) int8
    vdf_ref,  # (1, H, W) bf16 — (1+p_veg)(1+p_den), static terrain
    slope_ref,  # (1, 3, 3, H, W) bf16 — exp(0.078*slope), static terrain;
    #            the largest input (9 planes), halved by bf16
    bands_h_ref,  # (NB, H, H) bf16 — banded-ones stack (constant block)
    bands_w_ref,  # (NB, W, W) bf16 — ditto for the column direction
    wind_ref,  # (1, 1, 8) f32 SMEM — wind matrix in NEIGHBOR_OFFSETS order
    seed_ref,  # (1, 1, 2) int32 SMEM — two PRNG seed words per (env, step)
    out_grid_ref,  # (1, H, W) int32
    out_age_ref,  # (1, H, W) f32
    *,
    empty: int,
    tree: int,
    fire: int,
    layer_coeffs: Tuple[float, ...],  # telescoped box coefficients, radius 1..R
    dousing_border: float,
    dousing_inner: float,
    fire_age_min: int,
    fire_age_max: int,
):
    # Two seed words (the env's full threefry key data): a single 31-bit
    # seed would birthday-collide over long training runs.
    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])

    # Widen the compact streams in VMEM: int32 for the rolls (Mosaic has no
    # int8 rotate or compare).
    g = grid_ref[0].astype(jnp.int32)
    age = age_ref[0]
    h, w = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    fire_mask = g == fire
    fire16 = fire_mask.astype(jnp.bfloat16)
    dous16 = (dous_ref[0].astype(jnp.int32) > 0).astype(jnp.bfloat16)

    # heat = sum_r c_r * box_r(fire); dousing = two-level box on counts.
    # Box sums ride the MXU as bf16 banded matmuls (exact: counts <= 169).
    heat = jnp.zeros((h, w), jnp.float32)
    for r, c in enumerate(layer_coeffs, start=1):
        heat = heat + c * _box(fire16, bands_h_ref[r - 1], bands_w_ref[r - 1])
    dousing_ret = (
        (dousing_inner - dousing_border)
        * _box(dous16, bands_h_ref[0], bands_w_ref[0])
        + dousing_border * _box(dous16, bands_h_ref[1], bands_w_ref[1])
    )

    base = (heat - dousing_ret) * vdf_ref[0].astype(jnp.float32)

    # ignition: complement product over the 8 directions, one uniform/cell
    no_ignite = jnp.ones((h, w), jnp.float32)
    for d, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
        fire_there = _shift2d(g, dr, dc, empty, rows, cols) == fire
        p = base * wind_ref[0, 0, d] * slope_ref[0, 1 + dr, 1 + dc].astype(
            jnp.float32
        )
        no_ignite = no_ignite * jnp.maximum(
            1.0 - jnp.where(fire_there, p, 0.0), 0.0
        )
    u = _uniform_01((h, w))
    ignite = u < 1.0 - no_ignite

    # fresh fire ages: fire_age_min + bits % span (span << 2^32: bias ~0)
    span = max(fire_age_max - fire_age_min, 1)
    age_bits = pltpu.bitcast(pltpu.prng_random_bits((h, w)), jnp.uint32)
    sampled_age = (
        fire_age_min
        + pltpu.bitcast(age_bits % jnp.uint32(span), jnp.int32)
    ).astype(jnp.float32)

    tree_mask = g == tree
    burnout = fire_mask & (age <= 1.0)
    new_g = jnp.where(
        tree_mask & ignite, fire, jnp.where(burnout, empty, g)
    ).astype(jnp.int32)

    new_fire = (new_g == fire) & jnp.logical_not(fire_mask)
    new_age = jnp.where(new_fire, sampled_age, age)
    new_age = jnp.where(fire_mask, new_age - 1.0, new_age)

    out_grid_ref[0] = new_g.astype(out_grid_ref.dtype)
    out_age_ref[0] = new_age


_VMEM_BUDGET_FUSED = 14 * 1024 * 1024


def supports_fused_alexandridis(h: int, w: int, radius: int = None) -> bool:
    """VMEM-budget gate for the fused CA kernel.

    Per grid program the pipeline double-buffers 13 (H, W) f32 input planes
    (grid/age/dousing/vdf + 9 slope directions) and 2 outputs, plus the
    shared bf16 banded-ones stacks; past ~320^2 that blows the ~16 MB VMEM
    and Mosaic refuses to compile — callers must fall back to the XLA path
    (mirrors ``supports_sparse_kernel`` for the windy kernel).
    """
    import math

    if h % 8 != 0 or w % 128 != 0:
        return False
    if radius is None:
        radius = max(math.ceil(math.log2(max(h, 4))) - 2, 1)
    n_bands = max(radius, 2)
    plane = h * w * 4
    blocks = 2 * (13 + 2) * plane  # double-buffered in/out (H, W) f32 planes
    bands = 2 * n_bands * (h * h + w * w) * 2  # bf16 stacks, double-buffered
    scratch = 6 * plane  # live f32 temporaries inside the kernel body
    return blocks + bands + scratch <= _VMEM_BUDGET_FUSED


@functools.partial(
    jax.jit,
    static_argnames=(
        "empty", "tree", "fire", "layer_coeffs", "dousing_border",
        "dousing_inner", "fire_age_min", "fire_age_max", "interpret",
    ),
)
def alexandridis_fused_step(
    grid,  # (N, H, W) int32
    fire_age,  # (N, H, W) f32
    dousing,  # (N, H, W) int32
    vdf,  # (N, H, W) f32
    exp_slope,  # (N, 3, 3, H, W) f32
    wind_rows,  # (N, 8) f32 — per-env wind matrix in NEIGHBOR_OFFSETS order
    seeds,  # (N, 2) int32 — PRNG seed words per env
    *,
    empty: int,
    tree: int,
    fire: int,
    layer_coeffs: Tuple[float, ...],
    dousing_border: float,
    dousing_inner: float,
    fire_age_min: int,
    fire_age_max: int,
    interpret: bool = False,
):
    """Batched fused Alexandridis update: returns (new_grid, new_fire_age).

    ``interpret=True`` runs under the TPU interpreter (CPU testing) where
    ``prng_random_bits`` is a zero stub: uniforms become 0 (so ignition
    fires iff p > 0) and sampled ages collapse to ``fire_age_min`` — the
    deterministic sub-behavior tests rely on exactly that.
    """
    n, h, w = grid.shape
    assert supports_fused_alexandridis(h, w, len(layer_coeffs)), (h, w)
    kernel = functools.partial(
        _alexandridis_kernel,
        empty=empty, tree=tree, fire=fire, layer_coeffs=layer_coeffs,
        dousing_border=dousing_border, dousing_inner=dousing_inner,
        fire_age_min=fire_age_min, fire_age_max=fire_age_max,
    )
    n_bands = max(len(layer_coeffs), 2)
    bands_h = build_banded_ones(h, n_bands)
    bands_w = bands_h if h == w else build_banded_ones(w, n_bands)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 3, 3, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((n_bands, h, h), lambda i: (0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((n_bands, w, w), lambda i: (0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w), jnp.int8),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * (len(layer_coeffs) + 1) * 4 * h * w * max(h, w),
            bytes_accessed=n * h * w * 4 * 8,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        # Compact streams match the Advanced env's state dtypes (int8 grid/
        # dousing, bf16 terrain factors), so these casts are free no-ops on
        # the env path and only pay for callers passing wider dtypes.
        grid.astype(jnp.int8),
        fire_age.astype(jnp.float32),
        dousing.astype(jnp.int8),
        vdf.astype(jnp.bfloat16),
        exp_slope.astype(jnp.bfloat16),
        bands_h,
        bands_w,
        wind_rows[:, None, :].astype(jnp.float32),
        seeds[:, None, :].astype(jnp.int32),
    )
