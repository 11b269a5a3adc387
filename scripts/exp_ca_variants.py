#!/usr/bin/env python
"""Measure per-grid cost of windy-CA update formulations inside a Pallas
kernel: (A) banded int32 conv+decode (current), (B) boolean int8 rule.

Both are bit-identical in output (the conv decode reduces to: fire->empty,
tree->fire iff any successful-direction fire neighbor, else keep).
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gymca_tpu.ops.pallas_kernels import _banded_signal, _ca_decode

N, H, W = 256, 256, 256
STEPS = 40
EMPTY, TREE, FIRE = 0, 3, 25


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def kernel_banded(g_ref, w_ref, out_ref, cnt_ref):
    g = g_ref[0].astype(jnp.int32)
    ws = [w_ref[0, 0, i] for i in range(8)]
    signal, rows, cols = _banded_signal(g, ws, EMPTY)
    ca = _ca_decode(signal, g, EMPTY, TREE, FIRE)
    out_ref[0] = ca.astype(out_ref.dtype)
    cnt_ref[0, 0, 0] = jnp.sum((ca == TREE).astype(jnp.int32))
    cnt_ref[0, 0, 1] = jnp.sum((ca == FIRE).astype(jnp.int32))


def kernel_bool(g_ref, w_ref, out_ref, cnt_ref):
    """Boolean rule in int32 domain (Mosaic rolls need 32-bit data): roll
    the fire mask, gate each direction by its gust-success bit (AND with a
    0/-1 broadcast), OR-accumulate 'any gusted fire neighbor'."""
    g = g_ref[0].astype(jnp.int32)  # int8 -> int32 lanes
    fire_mask = jnp.where(g == FIRE, -1, 0)
    h, w = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    r_lt, r_ge = rows < h - 1, rows >= 1
    c_lt, c_ge = cols < w - 1, cols >= 1
    zero = jnp.zeros((), jnp.int32)

    from gymca_tpu.ops.pallas_kernels import _WIDX

    def gate(d):  # 0 or -1 (all-ones) int32 scalar
        return -(w_ref[0, 0, _WIDX[d]] > 0).astype(jnp.int32)

    acc = jnp.zeros((h, w), jnp.int32)
    for dr in (1, 0, -1):
        if dr == 1:
            band = jnp.where(r_lt, pltpu.roll(fire_mask, h - 1, 0), zero)
        elif dr == -1:
            band = jnp.where(r_ge, pltpu.roll(fire_mask, 1, 0), zero)
        else:
            band = fire_mask
        if dr != 0:
            acc = acc | (band & gate((dr, 0)))
        acc = acc | (
            jnp.where(c_lt, pltpu.roll(band, w - 1, 1), zero) & gate((dr, 1))
        )
        acc = acc | (
            jnp.where(c_ge, pltpu.roll(band, 1, 1), zero) & gate((dr, -1))
        )
    tree_mask = g == TREE
    new = jnp.where(
        fire_mask != 0,
        EMPTY,
        jnp.where(tree_mask & (acc != 0), FIRE, g),
    )
    out_ref[0] = new.astype(out_ref.dtype)
    cnt_ref[0, 0, 0] = jnp.sum((new == TREE).astype(jnp.int32))
    cnt_ref[0, 0, 1] = jnp.sum((new == FIRE).astype(jnp.int32))


def kernel_fma(g_ref, w_ref, out_ref, cnt_ref):
    """Banded signal in f32 so weight-MAC pairs can fuse into VPU FMAs
    (exact: signal < 2^17 << 2^24).  Same decode thresholds."""
    g = g_ref[0].astype(jnp.float32)
    ws = [w_ref[0, 0, i].astype(jnp.float32) for i in range(8)]
    h, w = g.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    r_lt, r_ge = rows < h - 1, rows >= 1
    c_lt, c_ge = cols < w - 1, cols >= 1
    zero = jnp.zeros((), jnp.float32)

    from gymca_tpu.ops.pallas_kernels import _WIDX

    def roll_f(x, shift, axis):
        return pltpu.roll(x, shift, axis)

    signal = float(2**11) * g
    for dr in (1, 0, -1):
        if dr == 1:
            band = jnp.where(r_lt, roll_f(g, h - 1, 0), zero)
        elif dr == -1:
            band = jnp.where(r_ge, roll_f(g, 1, 0), zero)
        else:
            band = g
        if dr != 0:
            signal = signal + ws[_WIDX[(dr, 0)]] * band
        signal = signal + ws[_WIDX[(dr, 1)]] * jnp.where(
            c_lt, roll_f(band, w - 1, 1), zero
        )
        signal = signal + ws[_WIDX[(dr, -1)]] * jnp.where(
            c_ge, roll_f(band, 1, 1), zero
        )
    from gymca_tpu.ops.windy import windy_breaks

    b = windy_breaks(EMPTY, TREE, FIRE)
    new = jnp.where(
        signal >= b.consume,
        EMPTY,
        jnp.where(signal >= b.propagate, FIRE,
                  jnp.where(signal >= b.keep, TREE, EMPTY)),
    )
    out_ref[0] = new.astype(out_ref.dtype)
    cnt_ref[0, 0, 0] = jnp.sum((new == TREE).astype(jnp.int32))
    cnt_ref[0, 0, 1] = jnp.sum((new == FIRE).astype(jnp.int32))


def kernel_swar(g_ref, w_ref, out_ref, cnt_ref):
    """D: int8-native elementwise + byte-packed uint32 shifts.

    Elementwise compares/selects stay in int8 (4 cells per lane if Mosaic
    packs natively); only the neighbor shifts cross into a byte-packed
    uint32 view (cell col = 4*word + byte), where a column shift is a byte
    shift + one lane roll for the cross-word carry; counts come from
    popcounts on the packed masks."""
    g8 = g_ref[0]  # (H, W) int8
    h, w = g8.shape
    w32 = w // 4
    from gymca_tpu.ops.pallas_kernels import _WIDX

    def gate(d):  # 0 or all-ones uint32 scalar
        return (jnp.uint32(0) - (w_ref[0, 0, _WIDX[d]] > 0).astype(jnp.uint32))

    fire8 = jnp.where(g8 == FIRE, jnp.int8(-1), jnp.int8(0))
    m = jax.lax.bitcast_convert_type(
        fire8.reshape(h, w32, 4), jnp.uint32
    )  # (h, w32), bytes 0xFF where fire

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w32), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (h, w32), 1)
    r_lt, r_ge = rows < h - 1, rows >= 1
    c_lt, c_ge = lanes < w32 - 1, lanes >= 1
    z = jnp.zeros((), jnp.uint32)

    bu = jnp.where(r_lt, pltpu.roll(m, h - 1, 0), z)  # row r+1
    bd = jnp.where(r_ge, pltpu.roll(m, 1, 0), z)  # row r-1

    pre_p = (bu & gate((1, 1))) | (m & gate((0, 1))) | (bd & gate((-1, 1)))
    pre_m = (bu & gate((1, -1))) | (m & gate((0, -1))) | (bd & gate((-1, -1)))
    acc = (bu & gate((1, 0))) | (bd & gate((-1, 0)))

    # value from col c+1: bytes shift down; byte 3 carries from word+1
    acc = acc | (
        (pre_p >> jnp.uint32(8))
        | jnp.where(
            c_lt,
            (pltpu.roll(pre_p, w32 - 1, 1) & jnp.uint32(0xFF))
            << jnp.uint32(24),
            z,
        )
    )
    # value from col c-1: bytes shift up; byte 0 carries from word-1
    acc = acc | (
        (pre_m << jnp.uint32(8))
        | jnp.where(
            c_ge,
            (pltpu.roll(pre_m, 1, 1) >> jnp.uint32(24)) & jnp.uint32(0xFF),
            z,
        )
    )

    burn8 = jax.lax.bitcast_convert_type(acc, jnp.int8).reshape(h, w)
    tree_old = g8 == TREE
    burn = tree_old & (burn8 != 0)
    keep = tree_old & jnp.logical_not(burn)
    new = jnp.where(
        burn, jnp.int8(FIRE), jnp.where(keep, jnp.int8(TREE), jnp.int8(EMPTY))
    )
    out_ref[0] = new

    def count(mask8):  # popcount on the packed one-bytes
        ones = jnp.where(mask8, jnp.int8(1), jnp.int8(0))
        packed = jax.lax.bitcast_convert_type(
            ones.reshape(h, w32, 4), jnp.uint32
        )
        return jnp.sum(jax.lax.population_count(packed).astype(jnp.int32))

    cnt_ref[0, 0, 0] = count(keep)
    cnt_ref[0, 0, 1] = count(burn)


def run_variant(kernel, grid, weights01):
    @jax.jit
    def run(grid, weights01):
        def body(g, _):
            g2, counts = pl.pallas_call(
                kernel,
                grid=(N,),
                in_specs=[
                    pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=(
                    pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N, H, W), grid.dtype),
                    jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
                ),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(g, weights01)
            return g2, counts[0, 0, 0]

        g, c = jax.lax.scan(body, grid, None, length=STEPS)
        return g, c[-1:]

    return run


def main():
    key = jax.random.key(0)
    grid8 = jax.random.choice(
        key, jnp.asarray([EMPTY, TREE, FIRE], jnp.int8), (N, H, W),
        p=jnp.asarray([0.098, 0.9, 0.002]),
    )
    # banded kernel expects weights 0/PROPAGATION; bool kernel expects 0/1
    succ = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.6, (N, 1, 8))
    w_prop = succ.astype(jnp.int32) * 8
    w_01 = succ.astype(jnp.int32)

    ra = run_variant(kernel_banded, grid8, w_prop)
    dt = timeit(ra, grid8, w_prop)
    print(f"A banded int32 pipelined: {dt*1e6/N*1000:8.1f} ns/grid "
          f"({dt*1e6:7.1f} us/step)", flush=True)

    rb = run_variant(kernel_bool, grid8, w_01)
    dt = timeit(rb, grid8, w_01)
    print(f"B boolean int32 pipelined: {dt*1e6/N*1000:8.1f} ns/grid "
          f"({dt*1e6:7.1f} us/step)", flush=True)

    rc = run_variant(kernel_fma, grid8, w_prop)
    dt = timeit(rc, grid8, w_prop)
    print(f"C f32-FMA banded pipelined: {dt*1e6/N*1000:8.1f} ns/grid "
          f"({dt*1e6:7.1f} us/step)", flush=True)

    rd = run_variant(kernel_swar, grid8, w_01)
    dt = timeit(rd, grid8, w_01)
    print(f"D int8+packed-u32 SWAR: {dt*1e6/N*1000:8.1f} ns/grid "
          f"({dt*1e6:7.1f} us/step)", flush=True)

    # parity check
    ga, ca_ = ra(grid8, w_prop)
    gb, _ = rb(grid8, w_01)
    gc, _ = rc(grid8, w_prop)
    gd, cd_ = rd(grid8, w_01)
    import numpy as np
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gc))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gd))
    np.testing.assert_array_equal(np.asarray(ca_), np.asarray(cd_))
    print("parity A == B == C == D over", STEPS, "steps OK")


if __name__ == "__main__":
    main()
