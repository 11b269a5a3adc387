"""Extension system: purchasable observation channels + obs transforms.

Counterpart of reference ``bulldozer/utils/extension_utils.py``:

* ``apply_blur`` — 3x3 mean blur on the /3-normalized grid, rounded back to
  integers (``extension_utils.py:100-116``); this is the transform that
  actually obscures observations in practice;
* ``apply_visibility`` — hides cell value 3 during daytime
  (``extension_utils.py:90-96``).  QUIRK reproduced: the Advanced env's fire
  value is 2, so this transform is a no-op there (see QUIRKS.md);
* extension registry: ``unblur`` (skip_blur) and ``see_invisible_fires``
  (skip_visibility), at most one active (choose=1), selected through a
  combinatorial action id (``extension_utils.py:222-258``);
* ``apply_extensions`` — per-extension transformed grids gated by the binary
  action bits (``extension_utils.py:149-195``).

TPU-native: the blur is one 3x3 correlation (edge-padded); extension channels
are computed with plain ``where`` gating instead of a vmapped ``lax.switch``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp

from gymca_tpu.config import TYPE_INT
from gymca_tpu.ops.stencil import correlate2d

__all__ = [
    "apply_blur",
    "apply_visibility",
    "transform_grid",
    "apply_extensions",
    "ExtensionInfo",
    "ExtensionRegistry",
    "EXTENSION_REGISTRY",
    "total_extensions",
    "extension_choices",
]

VISIBILITY_HIDDEN_VALUE = 3  # reference quirk: hides 3, but advanced fire == 2


def apply_visibility(grid, is_night):
    """Hide value-3 cells during daytime (extension_utils.py:90-96)."""
    return jnp.where(
        (grid == VISIBILITY_HIDDEN_VALUE) & (is_night == 0), 0, grid
    )


def apply_blur(grid):
    """Uniform 3x3 blur with edge padding, /3-normalize then round back
    (extension_utils.py:100-116)."""
    normalized = grid.astype(jnp.float32) / 3.0
    h, w = grid.shape[-2:]
    pad = [(0, 0)] * (grid.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(normalized, pad, mode="edge")
    kernel = jnp.full((3, 3), 1.0 / 9.0)
    blurred = jnp.zeros_like(normalized)
    for i in range(3):
        for j in range(3):
            blurred = blurred + kernel[i, j] * jax_slice(padded, i, j, h, w)
    return jnp.round(blurred * 3.0).astype(jnp.int32)


def jax_slice(padded, i, j, h, w):
    import jax.lax as lax

    return lax.slice_in_dim(
        lax.slice_in_dim(padded, i, i + h, axis=-2), j, j + w, axis=-1
    )


def transform_grid(grid, is_night, skip_visibility, skip_blur):
    """Conditionally blur + hide (extension_utils.py:119-134)."""
    grid = jnp.where(skip_blur, grid, apply_blur(grid))
    grid = jnp.where(skip_visibility, grid, apply_visibility(grid, is_night))
    return grid


@dataclass(frozen=True)
class ExtensionInfo:
    """One purchasable observation channel (extension_utils.py:230-237)."""

    index: int
    name: str
    skip_visibility: int = 0
    skip_blur: int = 0


@dataclass(frozen=True)
class ExtensionRegistry:
    extensions: Tuple[ExtensionInfo, ...]
    choose: int  # max simultaneously active


# Default registry: unblur + see-invisible-fires, choose 1
# (extension_utils.py:241-258).
EXTENSION_REGISTRY: Tuple[ExtensionRegistry, ...] = (
    ExtensionRegistry(
        extensions=(
            ExtensionInfo(0, "unblur", skip_visibility=0, skip_blur=1),
            ExtensionInfo(1, "see_invisible_fires", skip_visibility=1, skip_blur=0),
        ),
        choose=1,
    ),
)


def extension_choices(registry=EXTENSION_REGISTRY):
    """[(n, k)] per registry group (advanced_bulldozer.py:858-863)."""
    return [(len(reg.extensions), reg.choose) for reg in registry]


def total_extensions(registry=EXTENSION_REGISTRY) -> int:
    return sum(len(reg.extensions) for reg in registry)


def apply_extensions(grid, ext_action_bits, is_night, enable_extensions: bool,
                     registry=EXTENSION_REGISTRY):
    """Per-extension channels, zeroed unless that extension's bit is set.

    ``ext_action_bits``: int vector of length ``total_extensions`` (binary
    selection from the combinatorial action id).  Returns a list of (H, W)
    channels, one per extension, in registry order.
    """
    if not enable_extensions:
        # extensions inert: the channels are definitionally zero — skip the
        # blur/visibility transforms entirely rather than leaving dead
        # compute for XLA's constant-folder to find
        return [
            jnp.zeros_like(grid)
            for reg in registry
            for _ in reg.extensions
        ]
    channels = []
    i = 0
    for reg in registry:
        for ext in sorted(reg.extensions, key=lambda e: e.index):
            transformed = transform_grid(
                grid, is_night, skip_visibility=ext.skip_visibility,
                skip_blur=ext.skip_blur,
            )
            channels.append(
                jnp.where(
                    ext_action_bits[i] > 0, transformed, jnp.zeros_like(grid)
                ).astype(grid.dtype)
            )
            i += 1
    return channels
