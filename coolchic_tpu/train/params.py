"""Parameter partitioning for the two-group optimizer setup.

The reference optimizes latent grids with Adam-like settings and network
weights with full SOAP, while freezing the synthesis output transform and
the global-flow buffers (coolchic/training/train.py:103-143).
"""

from __future__ import annotations

import jax

LATENT, WEIGHT, FROZEN = "latent", "weight", "frozen"


def leaf_group(path_str: str) -> str:
    if "latents" in path_str:
        return LATENT
    if "output_transform" in path_str or "global_flow" in path_str:
        return FROZEN
    return WEIGHT


def group_tree(params) -> list[str]:
    """Group label per flattened leaf (stable order)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return [leaf_group(jax.tree_util.keystr(path)) for path, _ in flat]
