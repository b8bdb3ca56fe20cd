"""Bisect the training-step cost on the real chip (VERDICT r2 weak #2).

Forward FLOPs at 512x768 hop are ~1 ms worth, yet the full SOAP window runs
77 ms/step at batch 1 and ~420 ms/step at batch 3. Variants, each a
100-step lax.scan in ONE device call (dispatch amortized), synced by host
fetch:

  fwd      forward only (loss value in carry)
  grad     forward+backward, SGD update (no opt state)
  gradmse  like grad but loss = MSE only (no rate term)
  gradrate like grad but loss = rate only (no upsampling/synthesis backward)
  soap     the real window (plain steps, no QR refresh)

Usage: python tools/profile_step_parts.py [batch ...] [--variants a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_forward, frame_encoder_init
from coolchic_tpu.train.loss import loss_function
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

H, W = 512, 768
STEPS = 100


def make_variant(fcfg, name: str):
    def loss_of(params, key, target, which):
        out = frame_encoder_forward(
            params, fcfg, key=key, quantizer_noise_type="gaussian",
            quantizer_type="softround", soft_round_temperature=jnp.float32(0.3),
            noise_parameter=jnp.float32(0.2), training=True)
        if which == "mse":
            mse = jnp.mean(jnp.square(out.decoded_image - target))
            return mse
        if which == "rate":
            return jnp.sum(out.rate) * 1e-9
        lo = loss_function(out.decoded_image, out.rate, target, {"mse": 1.0}, 1e-3)
        return lo.loss

    if name == "fwd":
        def step(carry, _):
            params, key, target, acc = carry
            key, sub = jax.random.split(key)
            acc = acc + loss_of(params, sub, target, "full")
            return (params, key, target, acc), None

        def run(params, key, target):
            carry = (params, key, target, jnp.float32(0.0))
            carry, _ = jax.lax.scan(step, carry, None, length=STEPS)
            return carry[3]

        return run

    which = {"grad": "full", "gradmse": "mse", "gradrate": "rate"}[name]

    def step(carry, _):
        params, key, target = carry
        key, sub = jax.random.split(key)
        g = jax.grad(loss_of)(params, sub, target, which)
        params = jax.tree_util.tree_map(lambda p, gg: p - 1e-3 * gg, params, g)
        return (params, key, target), None

    def run(params, key, target):
        carry = (params, key, target)
        carry, _ = jax.lax.scan(step, carry, None, length=STEPS)
        # fetchable scalar depending on everything
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), carry[0], jnp.float32(0.0))

    return run


def bench_soap(batch):
    from coolchic_tpu.parallel.encode_batch import _index, _make_batched, _stack
    from coolchic_tpu.train.train import _make_fns, init_opt_state

    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (H, W))}
    fcfg = FrameConfig(coolchic_cfg=cfgs, frame_type="I", frame_data_type="rgb", bitdepth=8)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)
    params_b = _stack([frame_encoder_init(keys[i], fcfg, None) for i in range(batch)])
    targets_b = jax.random.uniform(key, (batch, 1, 3, H, W), dtype=jnp.float32)
    fns = _make_fns(fcfg, "gaussian", "softround", (("mse", 1.0),), 1e-3,
                    (0.95, 0.95), (0.9, 0.999), 10, 100, False)
    window, _, _upd = _make_batched(fns, None)
    opt1 = init_opt_state(_index(params_b, 0), fns["hp_weight"], fns["hp_latent"])
    opt_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), opt1)
    kb = jax.random.split(key, batch)
    lam_b = jnp.full((batch,), 1e-3, dtype=jnp.float32)
    p, o, k = window(params_b, opt_b, kb, targets_b, lam_b, 1e-2, 0.3, 0.2, 10, 0)
    np.asarray(jax.tree_util.tree_leaves(p)[0].sum())
    t0 = time.time()
    p, o, k = window(p, o, kb, targets_b, lam_b, 1e-2, 0.3, 0.2, 10, 0)
    np.asarray(jax.tree_util.tree_leaves(p)[0].sum())
    dt = time.time() - t0
    print(f"  soap          b={batch}: {dt / STEPS * 1e3:8.2f} ms/step "
          f"({STEPS / dt:6.2f} it/s)", flush=True)


def run_batch(batch: int, variants):
    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (H, W))}
    fcfg = FrameConfig(coolchic_cfg=cfgs, frame_type="I", frame_data_type="rgb", bitdepth=8)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    params_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[frame_encoder_init(k, fcfg, None) for k in keys])
    targets_b = jax.random.uniform(keys[0], (batch, 1, 3, H, W), dtype=jnp.float32)
    kb = jax.random.split(keys[0], batch)

    print(f"== batch {batch}", flush=True)
    for name in variants:
        if name == "soap":
            bench_soap(batch)
            continue
        run = make_variant(fcfg, name)
        vrun = jax.jit(jax.vmap(run))
        t0 = time.time()
        np.asarray(vrun(params_b, kb, targets_b))
        t_c = time.time() - t0
        # fresh buffers for the timed call (the tunnel dedupes identical calls)
        params_b2 = jax.tree_util.tree_map(lambda x: x + 1e-6, params_b)
        t0 = time.time()
        np.asarray(vrun(params_b2, kb, targets_b))
        dt = time.time() - t0
        print(f"  {name:<12} b={batch}: {dt / STEPS * 1e3:8.2f} ms/step "
              f"({STEPS / dt:6.2f} it/s) [1st {t_c:.0f}s]", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", nargs="*", type=int, default=[1, 3])
    ap.add_argument("--variants", default="fwd,grad,gradmse,gradrate")
    a = ap.parse_args()
    for b in (a.batches or [1, 3]):
        run_batch(b, a.variants.split(","))
