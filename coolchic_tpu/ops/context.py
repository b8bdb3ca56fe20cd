"""Causal spatial-context extraction for the ARM entropy model.

The reference extracts contexts with pad + unfold + index_select
(coolchic/component/core/arm.py:420-445). On TPU a gather over a 9x9 unfold
is hostile to the VPU; instead each of the N static context offsets becomes
one shifted slice of the zero-padded grid, and the stack of N slices is the
[H*W, N] context matrix. XLA fuses the N slices into cheap strided reads and
the downstream ARM matmul stays the only real work.
"""

from __future__ import annotations

import jax.numpy as jnp

from coolchic_tpu.core.constants import MAX_ARM_MASK_SIZE, ctx_row_col_offsets


def spatial_context(grid: jnp.ndarray, n_spatial_ctx: int) -> jnp.ndarray:
    """Per-pixel causal contexts of a single-channel [H, W] latent grid.

    Returns [H * W, n_spatial_ctx]; column k holds the k-th context pixel
    (priority order), zero outside the grid.
    """
    h, w = grid.shape
    half = (MAX_ARM_MASK_SIZE - 1) // 2
    padded = jnp.pad(grid, ((half, half), (half, half)), mode="constant")
    cols = []
    for dy, dx in ctx_row_col_offsets(n_spatial_ctx):
        cols.append(padded[half + dy: half + dy + h, half + dx: half + dx + w])
    ctx = jnp.stack(cols, axis=-1)  # [H, W, N]
    return ctx.reshape(h * w, n_spatial_ctx)
