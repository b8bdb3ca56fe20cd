"""One complete Cool-Chic decoder-under-training as a pure JAX function.

forward = quantize latents -> ARM/IFCE rate -> learned upsampling ->
synthesis -> final rescale. Everything is shape-static for a given
(CoolChicConfig), so one jit specializes per architecture/image size and the
whole step runs on the MXU/VPU without host round-trips.

Reference parity: CoolChicEncoder.forward and helpers
(coolchic/component/core/coolchic.py:261-758).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.core.laplace import rate_bits
from coolchic_tpu.core.noise import common_randomness_grids
from coolchic_tpu.core.quantizer import quantize, sample_noise
from coolchic_tpu.models.arm import arm_apply, arm_init, arm_reparameterize, ifce_arm_index, ifce_init
from coolchic_tpu.models.synthesis import synthesis_apply, synthesis_init
from coolchic_tpu.models.upsampling import fixed_upsampling, upsampling_apply, upsampling_init
from coolchic_tpu.ops.context import spatial_context
from coolchic_tpu.ops.resize import interpolate, interpolate_x2


class CoolChicOutput(NamedTuple):
    raw_out: jnp.ndarray   # [1, C_out, H, W]
    rate: jnp.ndarray      # [n_latents] rate in bits per latent
    latents: list          # quantized (decoder-side) latent grids


def coolchic_init(key: jax.Array, cfg: CoolChicConfig,
                  img_min_max: jnp.ndarray | None = None) -> dict:
    k_arm, k_syn, k_ifce = jax.random.split(key, 3)
    params = {
        "latents": [jnp.zeros(s, dtype=jnp.float32) for s in cfg.size_per_latent],
        "arm": arm_init(k_arm, cfg.total_context_arm, cfg.n_hidden_layers_arm,
                        stabiliser=cfg.linear_stabiliser_arm),
        "upsampling": upsampling_init(cfg.ups_k_size, cfg.ups_preconcat_k_size, cfg.n_ups),
        "synthesis": synthesis_init(k_syn, cfg, img_min_max),
    }
    if cfg.flag_ifce:
        params["ifce"] = ifce_init(k_ifce, cfg.input_features_ifce, cfg.output_feature_ifce)
    return params


def make_cr_grids(cfg: CoolChicConfig) -> Optional[list[jnp.ndarray]]:
    """Deterministic common-randomness grids (largest first), or None."""
    if not cfg.flag_common_randomness:
        return None
    return [jnp.asarray(g) for g in common_randomness_grids(list(cfg.size_per_latent_cr))]


def quantize_latents(params: dict, cfg: CoolChicConfig, *, key: Optional[jax.Array],
                     quantizer_noise_type: str, quantizer_type: str,
                     soft_round_temperature, noise_parameter,
                     ac_max_val: int = -1) -> list[jnp.ndarray]:
    """Encoder gain + quantization proxy, matching the reference's single
    flattened quantize call (grid order preserved)."""
    need_noise = quantizer_type in ("none", "softround")
    out = []
    for i, lat in enumerate(params["latents"]):
        x = lat * cfg.encoder_gain
        if need_noise and quantizer_noise_type != "none":
            key, sub = jax.random.split(key)
            noise = sample_noise(sub, x.shape, quantizer_noise_type, noise_parameter)
        else:
            noise = jnp.zeros_like(x) if need_noise else None
        y = quantize(x, quantizer_type=quantizer_type, noise=noise,
                     soft_round_temperature=soft_round_temperature)
        if ac_max_val != -1:
            y = jnp.clip(y, -ac_max_val, ac_max_val - 1)
        out.append(y)
    return out


def ifce_context(params: dict, cfg: CoolChicConfig, grids: list[jnp.ndarray]) -> jnp.ndarray:
    """Inter-feature context for every latent pixel: [sum_i H_i*W_i, C_f].

    For grid i, the IFCE runs on the nearest-upsampled stack of already
    decoded (coarser) grids at one-level-coarser resolution, then the result
    is x2-nearest upsampled and cropped (reference coolchic.py:606-663).
    """
    n = len(grids)
    _, intermediates = fixed_upsampling(grids, mode="nearest")
    arm_index = ifce_arm_index(cfg.input_features_ifce)
    chunks = []
    for i, grid in enumerate(grids):
        h_i, w_i = grid.shape
        if cfg.input_features_ifce[i] > 0:
            already = intermediates[n - 1 - i]  # [c, h, w]
            c, h, w = already.shape
            flat = already.reshape(c, h * w).T  # [(h w), c]
            ctx = arm_apply(params["ifce"]["arms"][arm_index[i]], flat)  # [(h w), Cf]
            ctx = ctx.T.reshape(-1, h, w)
            ctx = interpolate_x2(ctx, "nearest")[:, :h_i, :w_i]
            chunks.append(ctx.reshape(-1, h_i * w_i).T)
        else:
            chunks.append(jnp.zeros((h_i * w_i, cfg.output_feature_ifce), dtype=jnp.float32))
    return jnp.concatenate(chunks, axis=0)


def latent_rate(params: dict, cfg: CoolChicConfig, grids: list[jnp.ndarray]
                ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-latent (rate_bits, mu, scale), flattened over all grids in order."""
    flat_latent = jnp.concatenate([g.reshape(-1) for g in grids])
    ctx_spatial = jnp.concatenate(
        [spatial_context(g, cfg.spatial_context_arm) for g in grids], axis=0)
    if cfg.flag_ifce:
        ctx = jnp.concatenate([ctx_spatial, ifce_context(params, cfg, grids)], axis=1)
    else:
        ctx = ctx_spatial
    mu, scale = arm_reparameterize(arm_apply(params["arm"], ctx))
    return rate_bits(flat_latent, mu, scale), mu, scale


def synthesis_input(cfg: CoolChicConfig, dense: jnp.ndarray,
                    cr: Optional[list[jnp.ndarray]],
                    no_cr: bool = False, only_cr: bool = False) -> jnp.ndarray:
    x = dense[None]  # [1, C, H, W]
    if cfg.flag_common_randomness:
        ups_noise, _ = fixed_upsampling(cr, mode="bicubic")
        ups_noise = interpolate(ups_noise, cfg.img_size, "bicubic")[None]
        if no_cr:
            ups_noise = ups_noise * 0
        if only_cr:
            x = x * 0
        x = jnp.concatenate([x, ups_noise], axis=1)
    return x


def coolchic_forward(params: dict, cfg: CoolChicConfig, *,
                     key: Optional[jax.Array] = None,
                     quantizer_noise_type: str = "gaussian",
                     quantizer_type: str = "softround",
                     soft_round_temperature=0.35,
                     noise_parameter=0.22,
                     training: bool = True,
                     ac_max_val: int = -1,
                     cr: Optional[list[jnp.ndarray]] = None,
                     no_cr: bool = False, only_cr: bool = False) -> CoolChicOutput:
    if not training:
        quantizer_noise_type, quantizer_type = "none", "hardround"

    grids = quantize_latents(
        params, cfg, key=key, quantizer_noise_type=quantizer_noise_type,
        quantizer_type=quantizer_type, soft_round_temperature=soft_round_temperature,
        noise_parameter=noise_parameter, ac_max_val=ac_max_val)

    rate, _, _ = latent_rate(params, cfg, grids)

    # Hyperlatents are entropy-coded but do not feed the synthesis.
    syn_grids = [g for g, hyper in zip(grids, cfg.flag_is_hyperlatent) if not hyper]
    dense = upsampling_apply(params["upsampling"], syn_grids, cfg.ups_k_size,
                             cfg.ups_preconcat_k_size, training)
    # under a spatial mesh the replicated pyramid output goes back to
    # H-sharded here, so the synthesis convs run sharded with GSPMD halos
    from coolchic_tpu.models.upsampling import respread_spatial

    dense = respread_spatial(dense)
    syn_in = synthesis_input(cfg, dense, cr, no_cr=no_cr, only_cr=only_cr)
    syn_out = synthesis_apply(params["synthesis"], cfg, syn_in, training=training)
    raw_out = interpolate(syn_out, cfg.img_size, cfg.final_upsampling_type)
    return CoolChicOutput(raw_out=raw_out, rate=rate, latents=grids)
