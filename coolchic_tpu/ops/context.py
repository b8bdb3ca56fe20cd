"""Causal spatial-context extraction for the ARM entropy model.

The reference extracts contexts with pad + unfold + index_select
(coolchic/component/core/arm.py:420-445). On TPU a gather over a 9x9 unfold
is hostile to the VPU; instead each of the N static context offsets becomes
one shifted slice of the zero-padded grid, and the stack of N slices is the
[H*W, N] context matrix. XLA fuses the N slices into cheap strided reads and
the downstream ARM matmul stays the only real work.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.core.constants import MAX_ARM_MASK_SIZE, ctx_row_col_offsets


@lru_cache(maxsize=None)
def _ctx_kernel_np(n_spatial_ctx: int) -> np.ndarray:
    """[N, 1, 5, 9] one-hot kernels: all causal offsets live in the top 5
    rows of the 9x9 window, so one conv extracts every context channel.
    Exact in f32 (each output is a single input value)."""
    half = (MAX_ARM_MASK_SIZE - 1) // 2
    k = np.zeros((n_spatial_ctx, 1, half + 1, MAX_ARM_MASK_SIZE), dtype=np.float32)
    for c, (dy, dx) in enumerate(ctx_row_col_offsets(n_spatial_ctx)):
        assert -half <= dy <= 0
        k[c, 0, half + dy, half + dx] = 1.0
    return k


def spatial_context(grid: jnp.ndarray, n_spatial_ctx: int) -> jnp.ndarray:
    """Per-pixel causal contexts of a single-channel [H, W] latent grid.

    Returns [H * W, n_spatial_ctx]; column k holds the k-th context pixel
    (priority order), zero outside the grid.

    Implemented as ONE convolution with N one-hot kernels: a single fused
    MXU op (and a single conv in the backward pass) instead of N shifted
    slices -- dramatically smaller XLA graphs for the jitted train step.
    """
    h, w = grid.shape
    half = (MAX_ARM_MASK_SIZE - 1) // 2
    kernel = jnp.asarray(_ctx_kernel_np(n_spatial_ctx))
    ctx = jax.lax.conv_general_dilated(
        grid[None, None], kernel, (1, 1),
        padding=[(half, 0), (half, half)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # [1, N, H, W]
    return ctx[0].reshape(n_spatial_ctx, h * w).T


def spatial_context_slices(grid: jnp.ndarray, n_spatial_ctx: int) -> jnp.ndarray:
    """Slice-stack variant (bit-identical result; kept as an oracle)."""
    h, w = grid.shape
    half = (MAX_ARM_MASK_SIZE - 1) // 2
    padded = jnp.pad(grid, ((half, half), (half, half)), mode="constant")
    cols = []
    for dy, dx in ctx_row_col_offsets(n_spatial_ctx):
        cols.append(padded[half + dy: half + dy + h, half + dx: half + dx + w])
    ctx = jnp.stack(cols, axis=-1)  # [H, W, N]
    return ctx.reshape(h * w, n_spatial_ctx)
