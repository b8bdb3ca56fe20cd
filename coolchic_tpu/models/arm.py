"""Auto-Regressive entropy Model (ARM) and Inter-Feature Context Extractor
(IFCE), as pure JAX functions over explicit parameter pytrees.

Model definition (reference parity: coolchic/component/core/arm.py:22-417):
  - trunk: n_hidden residual [C -> C] linear layers + ReLU, then a final
    [C -> 2] linear layer;
  - optional parallel linear stabiliser [C -> 2] added to the trunk output;
  - output reparameterization: mu = y[:, 0],
    b = exp(clamp(y[:, 1] - 4, -5, 5)).

The IFCE is a bank of zero-hidden-layer ARMs (one per latent grid in the IFCE
resolution range) mapping already-decoded coarser grids to extra context
features.

Parameter layout (dicts of torch-layout [out, in] weights) is chosen so the
bitstream NN codec can serialize parameters in the reference order without
any reshaping logic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coolchic_tpu.core.constants import ARM_LOG_SHIFT, LOG_SCALE_MAX, LOG_SCALE_MIN


def _linear_init(key: jax.Array, in_ft: int, out_ft: int, residual: bool) -> dict:
    """ArmLinear init: zero bias; zero weight if residual else N(0, out^-4)."""
    if residual:
        w = jnp.zeros((out_ft, in_ft), dtype=jnp.float32)
    else:
        w = jax.random.normal(key, (out_ft, in_ft), dtype=jnp.float32) / out_ft**2
    return {"weight": w, "bias": jnp.zeros((out_ft,), dtype=jnp.float32)}


def arm_init(key: jax.Array, dim_arm: int, n_hidden_layers: int, n_out: int = 2,
             stabiliser: bool = True) -> dict:
    keys = jax.random.split(key, n_hidden_layers + 2)
    layers = [
        _linear_init(keys[i], dim_arm, dim_arm, residual=True) for i in range(n_hidden_layers)
    ]
    layers.append(_linear_init(keys[n_hidden_layers], dim_arm, n_out, residual=False))
    params = {"layers": layers}
    if stabiliser:
        params["stabiliser"] = _linear_init(keys[-1], dim_arm, n_out, residual=False)
    return params


def arm_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """[B, C] contexts -> [B, n_out] raw outputs."""
    y = x
    layers = params["layers"]
    for lay in layers[:-1]:
        y = jax.nn.relu(y @ lay["weight"].T + lay["bias"] + y)
    last = layers[-1]
    y = y @ last["weight"].T + last["bias"]
    if "stabiliser" in params:
        stab = params["stabiliser"]
        y = y + x @ stab["weight"].T + stab["bias"]
    return y


def arm_reparameterize(raw: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raw [B, 2] ARM output -> (mu, laplace scale)."""
    mu = raw[:, 0]
    log_scale = jnp.clip(raw[:, 1] + ARM_LOG_SHIFT, LOG_SCALE_MIN, LOG_SCALE_MAX)
    return mu, jnp.exp(log_scale)


# ---------------------------------------------------------------------------
# IFCE
# ---------------------------------------------------------------------------
def ifce_init(key: jax.Array, input_features_ifce: tuple[int, ...],
              output_features_ifce: int) -> dict:
    """One linear ARM per latent grid with a non-zero input feature count.

    params["arms"][j] corresponds to the j-th active grid (in grid order);
    params["index_to_arm"] is not stored -- derive it from the config.
    """
    arms = []
    for in_ft in input_features_ifce:
        if in_ft == 0:
            continue
        key, sub = jax.random.split(key)
        arms.append(arm_init(sub, in_ft, 0, n_out=output_features_ifce, stabiliser=False))
    return {"arms": arms}


def ifce_arm_index(input_features_ifce: tuple[int, ...]) -> dict[int, int]:
    mapping = {}
    internal = 0
    for i, in_ft in enumerate(input_features_ifce):
        if in_ft == 0:
            continue
        mapping[i] = internal
        internal += 1
    return mapping
