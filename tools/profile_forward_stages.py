"""Ablate the vmapped coolchic forward stage by stage at batch 1 vs 3 on the
real chip: find which op makes the batched eval scale 7.8x instead of ~3x
(VERDICT r2 weak #2 root cause)."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from coolchic_tpu.models.coolchic import (
    coolchic_init,
    ifce_context,
    latent_rate,
    quantize_latents,
    synthesis_input,
)
from coolchic_tpu.models.arm import arm_apply, arm_reparameterize
from coolchic_tpu.models.synthesis import synthesis_apply
from coolchic_tpu.models.upsampling import fixed_upsampling, upsampling_apply
from coolchic_tpu.ops.context import spatial_context
from coolchic_tpu.ops.resize import interpolate
from coolchic_tpu.core.laplace import rate_bits
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

H, W = 512, 768
CFG = coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (H, W))


import numpy as np


def bench(name, fn, args, n=10):
    """Each call gets a perturbed copy of the first arg (so the runtime cannot
    dedupe identical executions) and syncs by FETCHING a scalar to host
    (block_until_ready does not reliably block on the remote axon backend)."""
    scalar_fn = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))

    def perturb(a, eps):
        return jax.tree_util.tree_map(
            lambda x: x + eps if jnp.issubdtype(x.dtype, jnp.floating) else x, a)

    variants = [(perturb(args[0], 1e-6 * i),) + tuple(args[1:]) for i in range(4)]
    np.asarray(scalar_fn(*variants[0]))
    t0 = time.time()
    for i in range(n):
        np.asarray(scalar_fn(*variants[i % 4]))
    dt = (time.time() - t0) / n * 1e3
    print(f"  {name:<28} {dt:8.2f} ms", flush=True)
    return dt


def run(batch: int):
    print(f"== batch {batch}", flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    params_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[coolchic_init(k, CFG) for k in keys])
    # non-zero latents so nothing is optimized away
    params_b["latents"] = [jax.random.normal(keys[0], (batch,) + tuple(s)) * 0.5
                           for s in CFG.size_per_latent]

    def v(fn):
        return jax.vmap(fn)

    def f_quant(p):
        return quantize_latents(p, CFG, key=None, quantizer_noise_type="none",
                                quantizer_type="hardround",
                                soft_round_temperature=0.3, noise_parameter=0.2)

    grids_b = jax.jit(v(f_quant))(params_b)
    jax.block_until_ready(grids_b)

    bench("quantize", v(f_quant), (params_b,))

    def f_spatial(grids):
        return jnp.concatenate(
            [spatial_context(g, CFG.spatial_context_arm) for g in grids], axis=0)

    ctxs_b = jax.jit(v(f_spatial))(grids_b)
    bench("spatial_context", v(f_spatial), (grids_b,))

    if CFG.flag_ifce:
        def f_ifce(p, grids):
            return ifce_context(p, CFG, grids)

        bench("ifce_context", v(f_ifce), (params_b, grids_b))

    def f_arm(p, ctx, grids):
        flat = jnp.concatenate([g.reshape(-1) for g in grids])
        if CFG.flag_ifce:
            ctx = jnp.concatenate([ctx, ifce_context(p, CFG, grids)], axis=1)
        mu, scale = arm_reparameterize(arm_apply(p["arm"], ctx))
        return rate_bits(flat, mu, scale)

    bench("arm+rate(+ifce)", v(f_arm), (params_b, ctxs_b, grids_b))

    def f_ups(p, grids):
        syn_grids = [g for g, hyp in zip(grids, CFG.flag_is_hyperlatent) if not hyp]
        return upsampling_apply(p["upsampling"], syn_grids, CFG.ups_k_size,
                                CFG.ups_preconcat_k_size, False)

    dense_b = jax.jit(v(f_ups))(params_b, grids_b)
    bench("upsampling", v(f_ups), (params_b, grids_b))

    def f_syn(p, dense):
        return synthesis_apply(p["synthesis"], CFG, dense[None])

    syn_b = jax.jit(v(f_syn))(params_b, dense_b)
    bench("synthesis", v(f_syn), (params_b, dense_b))

    def f_resize(x):
        return interpolate(x, CFG.img_size, CFG.final_upsampling_type)

    bench("final rescale", v(f_resize), (syn_b,))

    def f_full(p):
        grids = f_quant(p)
        rate = f_arm(p, f_spatial(grids), grids)
        if CFG.flag_ifce:
            pass  # rate path above uses spatial only; full fwd for reference:
        dense = f_ups(p, grids)
        return f_resize(f_syn(p, dense)), rate

    bench("full fwd (spatial-only rate)", v(f_full), (params_b,))


if __name__ == "__main__":
    for b in (int(x) for x in (sys.argv[1:] or ["1", "3"])):
        run(b)
