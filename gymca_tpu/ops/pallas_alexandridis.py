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

__all__ = ["alexandridis_fused_step"]

_INV_2_24 = float(2.0 ** -24)


def _uniform_01(shape):
    """U[0,1) from the Pallas PRNG (24 high bits -> f32).  Bitcast to uint32
    first: a signed shift would produce negative values."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic can't cast uint32->f32; the >>8 result fits int32 (< 2^24).
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * _INV_2_24


def _banded(h: int, r: int):
    """(h, h) banded-ones matrix: 1 where |i - j| <= r (symmetric)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    return (jnp.abs(ii - jj) <= r).astype(jnp.float32)


def _box(x, d_rows, d_cols):
    """Chebyshev box sum via two banded matmuls (zero boundary exact)."""
    t = jax.lax.dot_general(
        d_rows, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(
        t, d_cols, (((1,), (0,)), ((), ())),
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
    grid_ref,  # (1, H, W) int32
    age_ref,  # (1, H, W) f32
    dous_ref,  # (1, H, W) int32
    vdf_ref,  # (1, H, W) f32 — (1+p_veg)(1+p_den), static terrain
    slope_ref,  # (1, 3, 3, H, W) f32 — exp(0.078*slope), static terrain
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

    g = grid_ref[0]
    age = age_ref[0]
    h, w = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    fire_mask = g == fire
    f32fire = fire_mask.astype(jnp.float32)
    dous = (dous_ref[0] > 0).astype(jnp.float32)

    # Banded-ones matrices, reused between the heat rings and the fixed
    # radius-1/2 dousing boxes (dousing must not depend on the heat radius).
    bands_h = {r: _banded(h, r) for r in range(1, len(layer_coeffs) + 1)}
    bands_h.setdefault(1, _banded(h, 1))
    bands_h.setdefault(2, _banded(h, 2))
    bands_w = bands_h if h == w else {r: _banded(w, r) for r in bands_h}

    # heat = sum_r c_r * box_r(fire); dousing = two-level box on counts.
    heat = jnp.zeros((h, w), jnp.float32)
    for r, c in enumerate(layer_coeffs, start=1):
        heat = heat + c * _box(f32fire, bands_h[r], bands_w[r])
    dousing_ret = (
        (dousing_inner - dousing_border) * _box(dous, bands_h[1], bands_w[1])
        + dousing_border * _box(dous, bands_h[2], bands_w[2])
    )

    base = (heat - dousing_ret) * vdf_ref[0]

    # ignition: complement product over the 8 directions, one uniform/cell
    no_ignite = jnp.ones((h, w), jnp.float32)
    for d, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
        fire_there = _shift2d(g, dr, dc, empty, rows, cols) == fire
        p = base * wind_ref[0, 0, d] * slope_ref[0, 1 + dr, 1 + dc]
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

    out_grid_ref[0] = new_g
    out_age_ref[0] = new_age


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
    kernel = functools.partial(
        _alexandridis_kernel,
        empty=empty, tree=tree, fire=fire, layer_coeffs=layer_coeffs,
        dousing_border=dousing_border, dousing_inner=dousing_inner,
        fire_age_min=fire_age_min, fire_age_max=fire_age_max,
    )
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
            jax.ShapeDtypeStruct((n, h, w), jnp.int32),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * (len(layer_coeffs) + 1) * 4 * h * w * max(h, w),
            bytes_accessed=n * h * w * 4 * 15,
            transcendentals=0,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        grid.astype(jnp.int32),
        fire_age.astype(jnp.float32),
        dousing.astype(jnp.int32),
        vdf.astype(jnp.float32),
        exp_slope.astype(jnp.float32),
        wind_rows[:, None, :].astype(jnp.float32),
        seeds[:, None, :].astype(jnp.int32),
    )
