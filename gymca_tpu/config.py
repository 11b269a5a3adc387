"""Canonical dtypes and global configuration for gymca_tpu.

TPU-first counterpart of the reference's ``gym_cellular_automata/_config.py:6-12``.

The reference pins float64 / int64 (NumPy CPU defaults).  On TPU, float64 is
emulated and int64 wastes HBM bandwidth, so the canonical dtypes here are
float32 / int32.  Cell grids are stored as int32 (int8 would save bandwidth but
hits TPU's (32, 128) tiling constraints and relayout costs for small grids; the
stencil kernels internally cast to float32/bfloat16 for the convolution path).
"""

from __future__ import annotations

import os
import pathlib

import jax.numpy as jnp

PROJECT_PATH = pathlib.Path(__file__).resolve().parent

# Canonical dtypes (TPU-native).
TYPE_BOX = jnp.float32  # continuous context values
TYPE_INT = jnp.int32  # cell states, positions, counters

# Set GYMCA_TPU_X64=1 to force float64 parity mode (CPU debugging only).
if os.environ.get("GYMCA_TPU_X64", "0") == "1":  # pragma: no cover
    import jax

    jax.config.update("jax_enable_x64", True)
