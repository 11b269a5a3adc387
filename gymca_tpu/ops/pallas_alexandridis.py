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


def _box_i8(x8, d_rows8, d_cols8):
    """Chebyshev box sum via two banded INT8 matmuls (s8 x s8 -> s32).

    v5e's MXU runs int8 at 2x its bf16 rate (394 vs 197 TOPS) and the
    banded-matmul box phase is MXU-saturated (measured: bf16 banded ==
    SAT in time) — int8 halves the kernel's dominant cost.  All values
    are exact small integers: masks/ones in {0,1}, row sums <= 2r+1 <= 13,
    box counts <= 169 << 2^31."""
    t = jax.lax.dot_general(
        d_rows8, x8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return jax.lax.dot_general(
        t.astype(jnp.int8), d_cols8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
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
    bands_h_ref,  # banded: (NB, H, H) bf16 stack | sat: (1, H, H) bf16 tril
    bands_w_ref,  # banded: (NB, W, W) bf16 stack | sat: (1, W, W) bf16 triu
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
    box_mode: str = "banded",  # "banded" = per-radius matmul pairs;
    #                            "sat" = one summed-area table (4 matmuls
    #                            total), bit-identical counts for H <= 256
    ablate: str = "",  # profiling aid (scripts/bench_fused_ca.py): skip one
    #                    phase to attribute kernel time.  NEVER set on the
    #                    env path — outputs are wrong by construction.
    #                    "prng" | "boxes" | "ignite"
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
    # Box sums are exact integer counts on either path (<= 169 < 2^8).
    if ablate == "boxes":
        heat = fire16.astype(jnp.float32) * 8.0
        dousing_ret = dous16.astype(jnp.float32)
    elif box_mode == "sat":
        heat = _sat_boxes(
            fire16, bands_h_ref[0], bands_w_ref[0],
            list(enumerate(layer_coeffs, start=1)), rows, cols,
        )
        dousing_ret = _sat_boxes(
            dous16, bands_h_ref[0], bands_w_ref[0],
            [(1, dousing_inner - dousing_border), (2, dousing_border)],
            rows, cols,
        )
    elif box_mode == "banded8":
        fire8 = fire_mask.astype(jnp.int8)
        dous8 = (dous_ref[0].astype(jnp.int32) > 0).astype(jnp.int8)
        heat = jnp.zeros((h, w), jnp.float32)
        for r, c in enumerate(layer_coeffs, start=1):
            heat = heat + c * _box_i8(
                fire8, bands_h_ref[r - 1], bands_w_ref[r - 1]
            ).astype(jnp.float32)
        dousing_ret = (
            (dousing_inner - dousing_border)
            * _box_i8(dous8, bands_h_ref[0], bands_w_ref[0]).astype(
                jnp.float32)
            + dousing_border * _box_i8(
                dous8, bands_h_ref[1], bands_w_ref[1]).astype(jnp.float32)
        )
    else:
        heat = jnp.zeros((h, w), jnp.float32)
        for r, c in enumerate(layer_coeffs, start=1):
            heat = heat + c * _box(
                fire16, bands_h_ref[r - 1], bands_w_ref[r - 1]
            )
        dousing_ret = (
            (dousing_inner - dousing_border)
            * _box(dous16, bands_h_ref[0], bands_w_ref[0])
            + dousing_border * _box(dous16, bands_h_ref[1], bands_w_ref[1])
        )

    base = (heat - dousing_ret) * vdf_ref[0].astype(jnp.float32)

    # ignition: complement product over the 8 directions, one uniform/cell.
    # Roll the f32 fire MASK (not the int32 grid): `where(fire_there, p, 0)`
    # == `p * fire` exactly for fire in {0, 1}, which drops the per-direction
    # int32 roll + compare + select — the loop was VPU-bound (the SAT change
    # proved the kernel is not MXU-bound).  Bit-identical outputs.
    fire_f = fire_mask.astype(jnp.float32)
    no_ignite = jnp.ones((h, w), jnp.float32)
    if ablate != "ignite":
        for d, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
            fire_there = _shift2d(fire_f, dr, dc, 0.0, rows, cols)
            p = base * wind_ref[0, 0, d] * slope_ref[
                0, 1 + dr, 1 + dc].astype(jnp.float32)
            no_ignite = no_ignite * jnp.maximum(1.0 - p * fire_there, 0.0)
    else:
        no_ignite = jnp.maximum(1.0 - base * 0.1, 0.0)
    if ablate == "prng":
        u = jnp.full((h, w), 0.5, jnp.float32)
    else:
        u = _uniform_01((h, w))
    ignite = u < 1.0 - no_ignite

    # fresh fire ages: fire_age_min + bits % span (span << 2^32: bias ~0)
    span = max(fire_age_max - fire_age_min, 1)
    if ablate == "prng":
        sampled_age = jnp.full((h, w), float(fire_age_min), jnp.float32)
    else:
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


def _radius_for(h: int) -> int:
    import math

    return max(math.ceil(math.log2(max(h, 4))) - 2, 1)


def _fits_single_program(
    h: int, w: int, radius: int, box_mode: str = "banded8"
) -> bool:
    """One grid program holds the WHOLE (H, W) lattice (original layout).

    ``box_mode`` sizes the constant band matrices: the default ``banded8``
    ships int8 stacks (1 B/elem), ``banded`` bf16 (2 B), ``sat`` one bf16
    tril + one triu (band count 1).  In practice the f32 pipeline blocks
    dominate, so the single-program ceiling (~320² for square grids) is
    mode-insensitive; the parameter keeps the accounting honest."""
    n_bands = 1 if box_mode == "sat" else max(radius, 2)
    elem = 2 if box_mode in ("banded", "sat") else 1
    plane = h * w * 4
    blocks = 2 * (13 + 2) * plane  # double-buffered in/out (H, W) f32 planes
    bands = 2 * n_bands * (h * h + w * w) * elem  # double-buffered
    scratch = 6 * plane  # live f32 temporaries inside the kernel body
    return blocks + bands + scratch <= _VMEM_BUDGET_FUSED


def _tiled_band_rows(h: int, w: int, radius: int):
    """Pick the row-band height for the tiled kernel, or None if no valid
    tiling exists.  Constraints: the halo (max(radius, 2) rounded up to the
    8-sublane alignment Mosaic wants for static row slices) must fit inside
    one band; the per-program working set — dtype-aware pipeline blocks,
    the rectangular row banded-ones stack, the single (W, W) triangular
    cumsum matrix, and the live temporaries — must fit VMEM."""
    halo = max(radius, 2)
    halo = (halo + 7) & ~7  # 8-aligned static slices
    n_bands = max(radius, 2)
    for band in (256, 128, 64, 32, 16, 8):
        if h % band or band < halo:
            continue
        ext_rows = band + 2 * halo
        p_f32, p_bf16, p_i8 = band * w * 4, band * w * 2, band * w
        blocks = 2 * (  # double-buffered pipeline blocks, actual dtypes
            3 * p_i8          # grid prev/cur/next
            + p_f32           # age
            + 3 * p_i8        # dousing prev/cur/next
            + p_bf16          # vdf
            + 9 * p_bf16      # slope
            + p_i8 + p_f32    # outputs
        )
        # int8 band/cumsum matrices (r5: the box matmuls run s8 on the MXU)
        mats = 2 * (n_bands * band * ext_rows + w * w)
        scratch = 10 * ext_rows * w * 4
        if blocks + mats + scratch <= _VMEM_BUDGET_FUSED:
            return band, halo
    return None


def supports_fused_alexandridis(h: int, w: int, radius: int = None) -> bool:
    """Gate for the fused CA kernel.

    Small grids (<= ~320^2) run as ONE grid program over the whole lattice;
    larger grids run the ROW-BAND TILED variant (halo rows assembled from
    the neighboring blocks, rectangular banded row matmuls + one shared
    (W, W) triangular cumsum for columns) — 512^2 (band 128), 1024^2
    (band 64) and, since the r5 int8 band/cumsum matrices (1 B/elem),
    2048^2 (band 16) run fused.  The remaining ceiling is that shared
    (W, W) cumsum matrix: at W = 4096 it alone (16 MB int8,
    double-buffered) blows VMEM, so 4096^2+ falls back to the XLA path
    (the reference's own JAX CA handles any size,
    ca_alexandridis_jax.py:321-424, at ~3 orders of magnitude lower
    throughput).  Width must be lane-aligned (w % 128 == 0): e.g. 320^2
    falls back."""
    if h % 8 != 0 or w % 128 != 0:
        return False
    if radius is None:
        radius = _radius_for(h)
    return _fits_single_program(h, w, radius) or (
        _tiled_band_rows(h, w, radius) is not None
    )


def build_banded_ones_rect(band: int, halo: int, n_bands: int) -> jnp.ndarray:
    """(n_bands, band, band + 2*halo) bf16 rectangular banded-ones stack for
    the tiled row direction: plane ``r-1`` maps extended rows (halo offset)
    to band rows within Chebyshev distance r."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (band, band + 2 * halo), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (band, band + 2 * halo), 1)
    d = jnp.abs(ii + halo - jj)
    return jnp.stack(
        [(d <= r).astype(jnp.bfloat16) for r in range(1, n_bands + 1)]
    )


def build_triu_ones(n: int) -> jnp.ndarray:
    """(n, n) bf16 upper-triangular ones: X @ triu = column-wise inclusive
    cumsum.  ONE matrix serves every box radius (box_r along columns =
    cum[:, j+r] - cum[:, j-r-1]), replacing the per-radius (W, W) banded
    stack that dominated the tiled kernel's VMEM."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ii <= jj).astype(jnp.bfloat16)


def build_tril_ones(n: int) -> jnp.ndarray:
    """(n, n) bf16 lower-triangular ones: tril @ X = row-wise inclusive
    cumsum (the row leg of the summed-area table)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (jj <= ii).astype(jnp.bfloat16)


def _sat_boxes(x16, tril, triu, radii_coeffs, rows, cols):
    """Weighted sum of Chebyshev box filters via ONE summed-area table.

    TWO matmuls total (row cumsum, column cumsum) replace the per-radius
    banded pair (the single-program kernel's former 2R+4 matmuls); each
    box_r then costs ~11 VPU roll/select ops via the 4-corner identity
        box_r[i,j] = D[min(i+r,H-1), j] - D[i-r-1, j]   (0 when i < r+1)
        D[i,   j]  = SAT[i, min(j+r,W-1)] - SAT[i, j-r-1] (0 when j < r+1)
    with edge clamping exact because x is zero outside the lattice.

    Exactness: x in {0,1} bf16; row cumsum <= H accumulates in f32; the
    bf16 recast feeding the second matmul is exact only for counts <= 256,
    hence the H <= 256 gate in the dispatcher.  SAT values <= H*W << 2^24
    stay exact in f32, so the resulting counts are bit-identical to the
    banded-matmul path."""
    h, w = x16.shape
    cr = jax.lax.dot_general(
        tril, x16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sat = jax.lax.dot_general(
        cr.astype(jnp.bfloat16), triu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lastcol = sat[:, w - 1:w]
    out = jnp.zeros((h, w), jnp.float32)
    for r, c in radii_coeffs:
        right = jnp.where(cols < w - r, pltpu.roll(sat, (-r) % w, 1), lastcol)
        left = jnp.where(cols >= r + 1, pltpu.roll(sat, r + 1, 1), 0.0)
        t = right - left
        down = jnp.where(
            rows < h - r, pltpu.roll(t, (-r) % h, 0), t[h - 1:h, :]
        )
        up = jnp.where(rows >= r + 1, pltpu.roll(t, r + 1, 0), 0.0)
        out = out + c * (down - up)
    return out


def _alexandridis_tiled_kernel(
    grid_prev_ref,  # (1, B, W) int8 — row-block b-1 (clamped at the edge)
    grid_cur_ref,  # (1, B, W) int8 — row-block b
    grid_next_ref,  # (1, B, W) int8 — row-block b+1 (clamped)
    age_ref,  # (1, B, W) f32 — local rows only
    dous_prev_ref,  # (1, B, W) int8
    dous_cur_ref,  # (1, B, W) int8
    dous_next_ref,  # (1, B, W) int8
    vdf_ref,  # (1, B, W) bf16
    slope_ref,  # (1, 3, 3, B, W) bf16
    bands_rows_ref,  # (NB, B, B + 2*HALO) int8 — rectangular, constant block
    triu_ref,  # (W, W) int8 upper-triangular ones — constant block
    wind_ref,  # (1, 1, 8) f32 SMEM
    seed_ref,  # (1, 1, 2) int32 SMEM
    out_grid_ref,  # (1, B, W) int8
    out_age_ref,  # (1, B, W) f32
    *,
    empty: int,
    tree: int,
    fire: int,
    layer_coeffs: Tuple[float, ...],
    dousing_border: float,
    dousing_inner: float,
    fire_age_min: int,
    fire_age_max: int,
    halo: int,
    total_rows: int,
):
    """Row-band tiled variant of :func:`_alexandridis_kernel` for lattices
    whose full plane set exceeds VMEM (~>320^2).  Each (env, band) program
    assembles an extended (B + 2*halo, W) slab from the neighbor row-blocks
    — same-array triple-fetch via three BlockSpecs with clamped index maps,
    so no manual DMA — masks out-of-domain halo rows, and runs the exact
    single-program math: row box sums via RECTANGULAR banded matmuls
    ((B, B+2h) @ (B+2h, W)), column box sums via ONE shared triangular
    cumsum matmul + lane-roll differences (cum[:, j+r] - cum[:, j-r-1]),
    ignition from one uniform per cell.  The PRNG is seeded per
    (env, band): band programs draw independent streams."""
    b = pl.program_id(1)
    # Mix the band index into both seed words (golden-ratio odd constant,
    # written as its int32 bit pattern) — a third prng_seed operand fails
    # Mosaic lowering ("UNKNOWN SSA VALUE"), so band independence comes
    # from the mix instead.
    bmix = b * jnp.int32(-1640531527)  # 0x9E3779B9 as int32
    pltpu.prng_seed(seed_ref[0, 0, 0] ^ bmix, seed_ref[0, 0, 1] + b)

    bsz = grid_cur_ref.shape[1]
    w = grid_cur_ref.shape[2]
    ext_rows = bsz + 2 * halo

    def assemble(prev_ref, cur_ref, next_ref, fill):
        ext = jnp.concatenate(
            [
                prev_ref[0, bsz - halo:].astype(jnp.int32),
                cur_ref[0].astype(jnp.int32),
                next_ref[0, :halo].astype(jnp.int32),
            ],
            axis=0,
        )
        # global-row validity: edge blocks clamp to themselves, so their
        # halo rows carry garbage — mask to the boundary fill value
        grow = (
            b * bsz - halo
            + jax.lax.broadcasted_iota(jnp.int32, (ext_rows, w), 0)
        )
        return jnp.where((grow >= 0) & (grow < total_rows), ext, fill)

    g_ext = assemble(grid_prev_ref, grid_cur_ref, grid_next_ref, empty)
    d_ext = assemble(dous_prev_ref, dous_cur_ref, dous_next_ref, 0)
    age = age_ref[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (bsz, w), 1)

    fire_ext8 = (g_ext == fire).astype(jnp.int8)
    dous_ext8 = (d_ext > 0).astype(jnp.int8)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (bsz, w), 1)

    def box(x8, r):
        # rows: rectangular banded INT8 matmul (s8 x s8 -> s32: 2x the bf16
        # MXU rate on v5e; see _box_i8 — the box phase is MXU-saturated)
        rows_sum = jax.lax.dot_general(
            bands_rows_ref[r - 1], x8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # cols: inclusive cumsum via the shared triangular matmul, then
        # box_r[:, j] = cum[:, j+r] - cum[:, j-r-1] with edge clamping.
        # rows_sum <= 2r+1 <= 19 fits int8 exactly; cum <= 19*W << 2^31.
        cum = jax.lax.dot_general(
            rows_sum.astype(jnp.int8), triu_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        total = jnp.sum(cum[:, w - 1:w], axis=1, keepdims=True)
        right = jnp.where(
            cols_b < w - r, pltpu.roll(cum, (-r) % w, 1), total
        )
        left = jnp.where(
            cols_b >= r + 1, pltpu.roll(cum, r + 1, 1), 0.0
        )
        return right - left

    heat = jnp.zeros((bsz, w), jnp.float32)
    for r, c in enumerate(layer_coeffs, start=1):
        heat = heat + c * box(fire_ext8, r)
    dousing_ret = (
        (dousing_inner - dousing_border) * box(dous_ext8, 1)
        + dousing_border * box(dous_ext8, 2)
    )
    base = (heat - dousing_ret) * vdf_ref[0].astype(jnp.float32)

    # Roll the f32 fire MASK, not the int32 grid — `where(fire_there, p, 0)`
    # == `p * fire` exactly for fire in {0, 1} (see the single-program
    # kernel); drops a compare + select per direction from the VPU-bound loop.
    fire_ext_f = (g_ext == fire).astype(jnp.float32)

    def shift_ext(dr: int, dc: int):
        """Center-band view of the fire mask displaced by (dr, dc);
        |dr| <= halo so the sublane roll + ALIGNED center slice never wraps
        garbage in."""
        out = fire_ext_f
        if dr != 0:
            out = pltpu.roll(out, (-dr) % ext_rows, 0)
        out = out[halo:halo + bsz]
        if dc != 0:
            out = pltpu.roll(out, (-dc) % w, 1)
            v = (cols < w - 1) if dc == 1 else (cols >= 1)
            out = jnp.where(v, out, 0.0)
        return out

    no_ignite = jnp.ones((bsz, w), jnp.float32)
    for d, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
        fire_there = shift_ext(dr, dc)
        p = base * wind_ref[0, 0, d] * slope_ref[0, 1 + dr, 1 + dc].astype(
            jnp.float32
        )
        no_ignite = no_ignite * jnp.maximum(1.0 - p * fire_there, 0.0)
    u = _uniform_01((bsz, w))
    ignite = u < 1.0 - no_ignite

    span = max(fire_age_max - fire_age_min, 1)
    age_bits = pltpu.bitcast(pltpu.prng_random_bits((bsz, w)), jnp.uint32)
    sampled_age = (
        fire_age_min
        + pltpu.bitcast(age_bits % jnp.uint32(span), jnp.int32)
    ).astype(jnp.float32)

    g = g_ext[halo:halo + bsz]
    fire_mask = g == fire
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "empty", "tree", "fire", "layer_coeffs", "dousing_border",
        "dousing_inner", "fire_age_min", "fire_age_max", "interpret",
        "force_tiled", "tile_band_rows", "box_mode", "ablate",
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
    force_tiled: bool = False,
    tile_band_rows: int | None = None,  # testing: force a band height so
    #                                     multi-band halo paths run on small grids
    box_mode: str = "auto",  # "auto" = "banded8" (int8 MXU matmuls, the
    #                          measured-fastest exact path); "banded" (bf16)
    #                          / "sat" pin a path for A/B testing.  The
    #                          TILED path (>~320^2) always runs its own int8
    #                          banded scheme and ignores this knob.
    ablate: str = "",  # profiling only (see _alexandridis_kernel); single-
    #                    program path only
):
    """Batched fused Alexandridis update: returns (new_grid, new_fire_age).

    Dispatches to the whole-lattice single-program kernel when it fits VMEM
    (<= ~320^2) and to the row-band tiled kernel otherwise (512^2 class);
    ``force_tiled`` pins the tiled path for differential testing.

    ``interpret=True`` runs under the TPU interpreter (CPU testing) where
    ``prng_random_bits`` is a zero stub: uniforms become 0 (so ignition
    fires iff p > 0) and sampled ages collapse to ``fire_age_min`` — the
    deterministic sub-behavior tests rely on exactly that.
    """
    n, h, w = grid.shape
    assert supports_fused_alexandridis(h, w, len(layer_coeffs)), (h, w)
    if box_mode not in ("auto", "banded", "banded8", "sat"):
        raise ValueError(f"unknown box_mode {box_mode!r}")
    # "auto" = int8 banded matmuls: the box phase is MXU-saturated and v5e
    # runs s8 x s8 -> s32 at 2x the bf16 rate; bit-identical counts.
    # SAT (4 matmuls + VPU extraction) measured equal to bf16 banded at 256²
    # — kept for A/B and as an exactness cross-check.
    mode = "banded8" if box_mode == "auto" else box_mode
    n_bands = max(len(layer_coeffs), 2)
    vm = pltpu.VMEM
    inputs_common = (
        grid.astype(jnp.int8),
        fire_age.astype(jnp.float32),
        dousing.astype(jnp.int8),
        vdf.astype(jnp.bfloat16),
        exp_slope.astype(jnp.bfloat16),
    )
    wind_in = wind_rows[:, None, :].astype(jnp.float32)
    seed_in = seeds[:, None, :].astype(jnp.int32)

    if force_tiled or not _fits_single_program(
        h, w, len(layer_coeffs), mode
    ):
        tiling = _tiled_band_rows(h, w, len(layer_coeffs))
        assert tiling is not None, (h, w)
        band, halo = tiling
        if tile_band_rows is not None:
            assert h % tile_band_rows == 0 and tile_band_rows >= halo
            band = tile_band_rows
        nb = h // band
        kernel = functools.partial(
            _alexandridis_tiled_kernel,
            empty=empty, tree=tree, fire=fire, layer_coeffs=layer_coeffs,
            dousing_border=dousing_border, dousing_inner=dousing_inner,
            fire_age_min=fire_age_min, fire_age_max=fire_age_max,
            halo=halo, total_rows=h,
        )
        g_in, age_in, d_in, vdf_in, slope_in = inputs_common
        local = lambda i, b: (i, b, 0)  # noqa: E731
        prev = lambda i, b: (i, jnp.maximum(b - 1, 0), 0)  # noqa: E731
        nxt = lambda i, b: (i, jnp.minimum(b + 1, nb - 1), 0)  # noqa: E731
        row_block = lambda ix: pl.BlockSpec(  # noqa: E731
            (1, band, w), ix, memory_space=vm
        )
        return pl.pallas_call(
            kernel,
            grid=(n, nb),
            in_specs=[
                row_block(prev), row_block(local), row_block(nxt),  # grid
                row_block(local),  # age
                row_block(prev), row_block(local), row_block(nxt),  # dousing
                row_block(local),  # vdf
                pl.BlockSpec((1, 3, 3, band, w),
                             lambda i, b: (i, 0, 0, b, 0), memory_space=vm),
                pl.BlockSpec((n_bands, band, band + 2 * halo),
                             lambda i, b: (0, 0, 0), memory_space=vm),
                pl.BlockSpec((w, w), lambda i, b: (0, 0),
                             memory_space=vm),
                pl.BlockSpec((1, 1, 8), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 2), lambda i, b: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                row_block(local),
                row_block(local),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, h, w), jnp.int8),
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            ),
            cost_estimate=pl.CostEstimate(
                flops=n * nb * len(layer_coeffs) * 2
                * (band * (band + 2 * halo) * w + band * w * w),
                bytes_accessed=n * h * w * 4 * 8,
                transcendentals=0,
            ),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            # same arrays bound to three BlockSpecs each: the prev/cur/next
            # row-blocks ARE the halo fetch (no manual DMA)
            g_in, g_in, g_in,
            age_in,
            d_in, d_in, d_in,
            vdf_in, slope_in,
            build_banded_ones_rect(band, halo, n_bands).astype(jnp.int8),
            build_triu_ones(w).astype(jnp.int8),
            wind_in,
            seed_in,
        )

    kernel = functools.partial(
        _alexandridis_kernel,
        empty=empty, tree=tree, fire=fire, layer_coeffs=layer_coeffs,
        dousing_border=dousing_border, dousing_inner=dousing_inner,
        fire_age_min=fire_age_min, fire_age_max=fire_age_max,
        box_mode=mode,
        ablate=ablate,
    )
    if mode == "sat":
        # summed-area-table path: one tril + one triu matrix serve every
        # radius (4 matmuls/env instead of 2R+4)
        bands_h = build_tril_ones(h)[None]
        bands_w = build_triu_ones(w)[None]
        nb_h = nb_w = 1
    else:
        bands_h = build_banded_ones(h, n_bands)
        bands_w = bands_h if h == w else build_banded_ones(w, n_bands)
        if mode == "banded8":
            bands_h = bands_h.astype(jnp.int8)
            bands_w = bands_w.astype(jnp.int8)
        nb_h = nb_w = n_bands
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
            pl.BlockSpec((nb_h, h, h), lambda i: (0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((nb_w, w, w), lambda i: (0, 0, 0),
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
        *inputs_common,
        bands_h,
        bands_w,
        wind_in,
        seed_in,
    )
