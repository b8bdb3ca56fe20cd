"""RDOQ: greedy rate-distortion refinement of the quantized NN parameters.

Every quantized scalar k*q_step is revisited in random order; all 31
candidate values k-15..k+15 are scored in ONE vmapped, jitted call and the
argmin kept. The reference walks shifts sequentially with early stopping
(coolchic/nnquant/rdoq.py:142-215); the batched sweep is strictly more
exhaustive per scalar and removes the per-candidate dispatch cost.

Fast partial scorers (reference rdoq.py:316-462):
  - arm:  lambda * (latent rate + module NN rate); distortion unaffected;
  - synthesis (intra): distortion + module NN rate; latent rate constant.
The module parameters are rebuilt from the flat candidate vector INSIDE the
jitted scorer, so only a [31, n] array crosses the host boundary per scalar.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.nncodec import flatten_module_params, unflatten_module_params
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.core.laplace import rate_bits
from coolchic_tpu.models.arm import arm_apply, arm_reparameterize
from coolchic_tpu.models.coolchic import ifce_context, synthesis_input
from coolchic_tpu.models.synthesis import synthesis_apply
from coolchic_tpu.models.upsampling import upsampling_apply
from coolchic_tpu.ops.context import spatial_context
from coolchic_tpu.ops.resize import interpolate

N_SHIFTS = 15
_N_CAND = 2 * N_SHIFTS + 1


def _expgol_rate_bits(v: jnp.ndarray, count: int) -> jnp.ndarray:
    x = jnp.abs(v)
    return jnp.sum(2.0 * jnp.floor(jnp.log2(2.0 * x / (2.0**count) + 1.0)) + count
                   + (v != 0))


def _module_shapes(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str):
    return [np.asarray(a).shape for a in flatten_module_params(cc_params, cfg, module, wb)]


def _flat(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str) -> np.ndarray:
    arrays = flatten_module_params(cc_params, cfg, module, wb)
    if not arrays:
        return np.zeros((0,), np.float32)
    return np.concatenate([np.asarray(a, np.float32).reshape(-1) for a in arrays])


def _rebuild(flat: jnp.ndarray, shapes: list) -> list[jnp.ndarray]:
    arrays, ptr = [], 0
    for s in shapes:
        n = int(np.prod(s))
        arrays.append(flat[ptr:ptr + n].reshape(s))
        ptr += n
    return arrays


def _set_flat(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str,
              flat: np.ndarray) -> dict:
    import copy

    shapes = _module_shapes(cc_params, cfg, module, wb)
    out = copy.deepcopy(cc_params)
    unflatten_module_params([jnp.asarray(a) for a in _rebuild(jnp.asarray(flat), shapes)],
                            cfg, module, wb, out)
    return out


def _arm_from_flat(flat_w, flat_b, cfg: CoolChicConfig, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    n_trunk = cfg.n_hidden_layers_arm + 1
    params = {"layers": [{"weight": w, "bias": b}
                         for w, b in zip(ws[:n_trunk], bs[:n_trunk])]}
    if cfg.linear_stabiliser_arm:
        params["stabiliser"] = {"weight": ws[n_trunk], "bias": bs[n_trunk]}
    return params


def _syn_from_flat(flat_w, flat_b, cfg: CoolChicConfig, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    i = 0
    params = {"output_transform": {"weight": ws[0], "bias": bs[0]}}
    i = 1
    if cfg.linear_stabiliser_synth:
        params["stabiliser"] = {"weight": ws[1], "bias": bs[1]}
        i = 2
    params["layers"] = [{"weight": w, "bias": b} for w, b in zip(ws[i:], bs[i:])]
    return params


@lru_cache(maxsize=32)
def _make_scorer(cfg: CoolChicConfig, module: str, wb: str, lmbda: float,
                 q: float, cnt: int, shapes_w: tuple, shapes_b: tuple):
    """Batched scorer: fn(flat_batch [B, n_wb], other_flat, activations...)."""
    if module == "arm":
        def score_one(flat_w, flat_b, flat_latent, ctx):
            arm = _arm_from_flat(flat_w, flat_b, cfg, list(shapes_w), list(shapes_b))
            mu, scale = arm_reparameterize(arm_apply(arm, ctx))
            edited = flat_w if wb == "weight" else flat_b
            nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
            return lmbda * (rate_bits(flat_latent, mu, scale).sum() + nn_bits)

        axes = (0, None, None, None) if wb == "weight" else (None, 0, None, None)
        return jax.jit(jax.vmap(score_one, in_axes=axes))

    def score_one(flat_w, flat_b, syn_in, target):
        syn = _syn_from_flat(flat_w, flat_b, cfg, list(shapes_w), list(shapes_b))
        out = synthesis_apply(syn, cfg, syn_in)
        out = jnp.clip(interpolate(out, cfg.img_size, cfg.final_upsampling_type), 0.0, 1.0)
        mse = jnp.mean(jnp.square(out - target))
        edited = flat_w if wb == "weight" else flat_b
        n_pixels = cfg.img_size[0] * cfg.img_size[1]
        nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
        return mse + lmbda * nn_bits / n_pixels

    axes = (0, None, None, None) if wb == "weight" else (None, 0, None, None)
    return jax.jit(jax.vmap(score_one, in_axes=axes))


def rdoq_coolchic(cc_params: dict, cfg: CoolChicConfig, q_shift: dict, expgol: dict,
                  lmbda: float, target=None, frame_type: str = "I", seed: int = 0,
                  modules: tuple = ("arm", "synthesis"), verbose: bool = False) -> dict:
    """Refine the quantized ARM / synthesis params of one cool-chic decoder."""
    rng = np.random.default_rng(seed)
    params = cc_params

    latents = [jnp.round(jnp.asarray(lat) * cfg.encoder_gain)
               for lat in cc_params["latents"]]
    flat_latent = jnp.concatenate([g.reshape(-1) for g in latents])

    for module in modules:
        if module == "synthesis" and (target is None or frame_type != "I"):
            continue
        if module == "arm":
            ctx_spatial = jnp.concatenate(
                [spatial_context(g, cfg.spatial_context_arm) for g in latents], axis=0)
            if cfg.flag_ifce:
                ctx = jnp.concatenate([ctx_spatial,
                                       ifce_context(params, cfg, latents)], axis=1)
            else:
                ctx = ctx_spatial
            activations = (flat_latent, ctx)
        else:
            syn_grids = [g for g, hyper in zip(latents, cfg.flag_is_hyperlatent)
                         if not hyper]
            dense = upsampling_apply(params["upsampling"], syn_grids, cfg.ups_k_size,
                                     cfg.ups_preconcat_k_size, training=False)
            activations = (synthesis_input(cfg, dense, None), jnp.asarray(target))

        shapes_w = tuple(_module_shapes(params, cfg, module, "weight"))
        shapes_b = tuple(_module_shapes(params, cfg, module, "bias"))
        flat_w = _flat(params, cfg, module, "weight")
        flat_b = _flat(params, cfg, module, "bias")

        for wb in ("weight", "bias"):
            q = 2.0 ** q_shift[(module, wb)]
            cnt = expgol[(module, wb)]
            flat = flat_w if wb == "weight" else flat_b
            if flat.size == 0:
                continue
            scorer = _make_scorer(cfg, module, wb, lmbda, q, cnt, shapes_w, shapes_b)
            shifts = (np.arange(-N_SHIFTS, N_SHIFTS + 1) * q).astype(np.float32)

            n_changed = 0
            for idx in rng.permutation(flat.size):
                batch = np.tile(flat, (_N_CAND, 1))
                batch[:, idx] = flat[idx] + shifts
                if wb == "weight":
                    losses = scorer(jnp.asarray(batch), jnp.asarray(flat_b), *activations)
                else:
                    losses = scorer(jnp.asarray(flat_w), jnp.asarray(batch), *activations)
                losses = np.array(losses)
                # Keep quantized magnitudes within the 16-bit header cap.
                losses[np.abs(np.round((flat[idx] + shifts) / q)) > 65535] = np.inf
                best = int(np.argmin(losses))
                if shifts[best] != 0.0:
                    flat[idx] = flat[idx] + shifts[best]
                    n_changed += 1
            if wb == "weight":
                flat_w = flat
            else:
                flat_b = flat
            params = _set_flat(params, cfg, module, wb, flat)
            if verbose:
                print(f"  rdoq {module}.{wb}: {n_changed}/{flat.size} scalars adjusted",
                      flush=True)

    return params
