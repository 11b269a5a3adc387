#!/usr/bin/env python
"""Where does the sparse-step floor live?  Times the XLA-side partition/pack
prologue of windy_fused_step in isolation, plus variants, with the
scan-inside-jit recipe."""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

N = 4096
STEPS = 1000
B = 128
P = N // B
TILE_R, TILE_C = 32, 128


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


def scan_over(f):
    @jax.jit
    def run(params, weights):
        def body(c, _):
            p, w = c
            out = f(p, w)
            # fold something back so nothing is DCE'd; keep params live
            p = p.at[:, 1].set(p[:, 1] ^ (out[0] & 1))
            return (p, w), out[1]

        (p, w), r = jax.lax.scan(body, (params, weights), None, length=STEPS)
        return r[-1:]

    return run


def prologue_current(params, weights):
    do_ca = params[:, 0] > 0
    shoot = params[:, 3] > 0
    is_modify = jnp.logical_not(do_ca) & shoot
    ca_i = do_ca.astype(jnp.int32)
    mod_i = is_modify.astype(jnp.int32)
    noop_i = 1 - ca_i - mod_i
    n_ca = jnp.sum(ca_i)
    n_active = n_ca + jnp.sum(mod_i)
    slot_of_env = (
        ca_i * (jnp.cumsum(ca_i) - 1)
        + mod_i * (n_ca + jnp.cumsum(mod_i) - 1)
        + noop_i * (n_active + jnp.cumsum(noop_i) - 1)
    )
    table_row = (slot_of_env % P) * B + slot_of_env // P
    perm = jnp.zeros((N,), jnp.int32).at[table_row].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True
    )
    p_ids = jnp.arange(P, dtype=jnp.int32)
    n0_p = (n_ca - p_ids + P - 1) // P
    n1_p = (n_active - p_ids + P - 1) // P
    env_ids = jnp.arange(N, dtype=jnp.int32)
    row_i = params[:, 1]
    col_i = params[:, 2]
    packed = jnp.concatenate(
        [
            jnp.stack([env_ids, row_i, col_i, params[:, 3]], axis=-1),
            weights,
            jnp.stack(
                [
                    (row_i // TILE_R) * TILE_R,
                    (col_i // TILE_C) * TILE_C,
                    row_i % TILE_R,
                    col_i % TILE_C,
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )[perm]
    return jnp.sum(packed[:, 0]) + n0_p[0] + n1_p[0], packed[0, 0]


def prologue_onecumsum(params, weights):
    do_ca = params[:, 0] > 0
    shoot = params[:, 3] > 0
    is_modify = jnp.logical_not(do_ca) & shoot
    ca_i = do_ca.astype(jnp.int32)
    mod_i = is_modify.astype(jnp.int32)
    noop_i = 1 - ca_i - mod_i
    # ONE cumsum of bit-packed class counters (each field < 2^12 at N=4096).
    packed_cls = ca_i + (mod_i << 12) + (noop_i << 24)
    cs = jnp.cumsum(packed_cls)
    r_ca = (cs & 0xFFF) - 1
    r_mod = ((cs >> 12) & 0xFFF) - 1
    r_noop = (cs >> 24) - 1
    n_ca = (cs[-1] & 0xFFF)
    n_active = n_ca + ((cs[-1] >> 12) & 0xFFF)
    slot_of_env = (
        ca_i * r_ca + mod_i * (n_ca + r_mod) + noop_i * (n_active + r_noop)
    )
    table_row = (slot_of_env % P) * B + slot_of_env // P
    perm = jnp.zeros((N,), jnp.int32).at[table_row].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True
    )
    p_ids = jnp.arange(P, dtype=jnp.int32)
    n0_p = (n_ca - p_ids + P - 1) // P
    n1_p = (n_active - p_ids + P - 1) // P
    env_ids = jnp.arange(N, dtype=jnp.int32)
    row_i = params[:, 1]
    col_i = params[:, 2]
    packed = jnp.concatenate(
        [
            jnp.stack([env_ids, row_i, col_i, params[:, 3]], axis=-1),
            weights,
            jnp.stack(
                [
                    (row_i // TILE_R) * TILE_R,
                    (col_i // TILE_C) * TILE_C,
                    row_i % TILE_R,
                    col_i % TILE_C,
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )[perm]
    return jnp.sum(packed[:, 0]) + n0_p[0] + n1_p[0], packed[0, 0]


def prologue_partition_only(params, weights):
    do_ca = params[:, 0] > 0
    shoot = params[:, 3] > 0
    is_modify = jnp.logical_not(do_ca) & shoot
    ca_i = do_ca.astype(jnp.int32)
    mod_i = is_modify.astype(jnp.int32)
    noop_i = 1 - ca_i - mod_i
    n_ca = jnp.sum(ca_i)
    n_active = n_ca + jnp.sum(mod_i)
    slot_of_env = (
        ca_i * (jnp.cumsum(ca_i) - 1)
        + mod_i * (n_ca + jnp.cumsum(mod_i) - 1)
        + noop_i * (n_active + jnp.cumsum(noop_i) - 1)
    )
    return jnp.sum(slot_of_env), slot_of_env[0]


def prologue_pack_only(params, weights):
    env_ids = jnp.arange(N, dtype=jnp.int32)
    row_i = params[:, 1]
    col_i = params[:, 2]
    packed = jnp.concatenate(
        [
            jnp.stack([env_ids, row_i, col_i, params[:, 3]], axis=-1),
            weights,
            jnp.stack(
                [
                    (row_i // TILE_R) * TILE_R,
                    (col_i // TILE_C) * TILE_C,
                    row_i % TILE_R,
                    col_i % TILE_C,
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )
    return jnp.sum(packed[:, 0]), packed[0, 0]


def prologue_scatter_only(params, weights):
    table_row = params[:, 1] * 16 + params[:, 0] % 16  # arbitrary perm-ish
    perm = jnp.zeros((N,), jnp.int32).at[table_row % N].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    return jnp.sum(perm), perm[0]


def make_inputs():
    key = jax.random.key(0)
    params = jnp.stack(
        [
            jax.random.bernoulli(key, 0.08, (N,)).astype(jnp.int32),
            jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, 256),
            jax.random.randint(jax.random.fold_in(key, 2), (N,), 0, 256),
            jax.random.bernoulli(jax.random.fold_in(key, 3), 0.5, (N,)).astype(
                jnp.int32
            ),
        ],
        axis=-1,
    )
    weights = jax.random.randint(jax.random.fold_in(key, 4), (N, 8), 0, 9)
    return params, weights


def main():
    params, weights = make_inputs()
    for name, f in [
        ("full prologue (current)", prologue_current),
        ("full prologue (1 cumsum)", prologue_onecumsum),
        ("partition only (3 cumsums)", prologue_partition_only),
        ("pack+gather only", prologue_pack_only),
        ("scatter only", prologue_scatter_only),
        ("rowscatter (no perm/gather)", prologue_rowscatter),
        ("scatter unique_indices", scatter_unique),
        ("gather rows only", gather_only),
    ]:
        dt = timeit(scan_over(f), params, weights)
        print(f"{name:28s}: {dt*1e6:7.1f} us/step", flush=True)


def prologue_rowscatter(params, weights):
    do_ca = params[:, 0] > 0
    shoot = params[:, 3] > 0
    is_modify = jnp.logical_not(do_ca) & shoot
    ca_i = do_ca.astype(jnp.int32)
    mod_i = is_modify.astype(jnp.int32)
    noop_i = 1 - ca_i - mod_i
    n_ca = jnp.sum(ca_i)
    n_active = n_ca + jnp.sum(mod_i)
    slot_of_env = (
        ca_i * (jnp.cumsum(ca_i) - 1)
        + mod_i * (n_ca + jnp.cumsum(mod_i) - 1)
        + noop_i * (n_active + jnp.cumsum(noop_i) - 1)
    )
    table_row = (slot_of_env % P) * B + slot_of_env // P
    env_ids = jnp.arange(N, dtype=jnp.int32)
    row_i = params[:, 1]
    col_i = params[:, 2]
    packed_env = jnp.concatenate(
        [
            jnp.stack([env_ids, row_i, col_i, params[:, 3]], axis=-1),
            weights,
            jnp.stack(
                [
                    (row_i // TILE_R) * TILE_R,
                    (col_i // TILE_C) * TILE_C,
                    row_i % TILE_R,
                    col_i % TILE_C,
                ],
                axis=-1,
            ),
        ],
        axis=-1,
    )
    packed = jnp.zeros((N, 16), jnp.int32).at[table_row].set(
        packed_env, unique_indices=True
    )
    return jnp.sum(packed[:, 0]), packed[0, 0]


def scatter_unique(params, weights):
    table_row = (params[:, 1] * 16 + params[:, 0] % 16) % N
    perm = jnp.zeros((N,), jnp.int32).at[table_row].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True
    )
    return jnp.sum(perm), perm[0]


def gather_only(params, weights):
    idx = (params[:, 1] * 16 + params[:, 0]) % N
    packed_env = jnp.tile(params, (1, 4))
    out = packed_env[idx]
    return jnp.sum(out[:, 0]), out[0, 0]


if __name__ == "__main__":
    main()
