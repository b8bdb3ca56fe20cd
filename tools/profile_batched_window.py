"""Profile the batched training window on the real chip: where does the
2.0-vs-13.6 it/s batch-3 gap (VERDICT r2, weak #2) come from?

Times a 100-step window at batch 1/3, with the SOAP QR eigenbasis refresh
on (pf=10) and effectively off (pf=10**6), plus the batched eval, at
512x768 hop -- the exact Kodak-sweep configuration.
"""

from __future__ import annotations

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

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
from coolchic_tpu.parallel.encode_batch import _index, _make_batched, _stack
from coolchic_tpu.train.train import _make_fns, init_opt_state
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

H, W = 512, 768
STEPS = 100


def block_until_ready(tree):
    # axon remote backend: block_until_ready does NOT wait -- a device->host
    # fetch is the only true barrier (same trick as bench.py's fetch()).
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def run(batch: int, pf: int, steps: int = STEPS):
    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (H, W))}
    fcfg = FrameConfig(coolchic_cfg=cfgs, frame_type="I", frame_data_type="rgb",
                       bitdepth=8)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)
    params_b = _stack([frame_encoder_init(keys[i], fcfg, None) for i in range(batch)])
    targets_b = jax.random.uniform(key, (batch, 1, 3, H, W), dtype=jnp.float32)
    # batched target layout in encode_batch is a stack of [1,3,H,W] -> [B,1,3,H,W]

    fns = _make_fns(fcfg, "gaussian", "softround", (("mse", 1.0),), 1e-3,
                    (0.95, 0.95), (0.9, 0.999), pf, 100, False)
    window, eval_b, _upd = _make_batched(fns, None)
    opt1 = init_opt_state(_index(params_b, 0), fns["hp_weight"], fns["hp_latent"])
    opt_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), opt1)
    kb = jax.random.split(key, batch)
    lam_b = jnp.full((batch,), 1e-3, dtype=jnp.float32)

    n_blocks, rem = divmod(steps, fns["pf"])
    # compile
    t0 = time.time()
    p2, o2, k2 = window(params_b, opt_b, kb, targets_b, lam_b, 1e-2, 0.3, 0.2,
                        n_blocks, rem)
    block_until_ready(p2)
    t_compile = time.time() - t0
    # the window DONATES params/opt/keys -- the originals are dead buffers now
    params_b, opt_b, kb = p2, o2, k2
    # steady state
    t0 = time.time()
    n_rep = 3
    for _ in range(n_rep):
        params_b, opt_b, kb = window(params_b, opt_b, kb, targets_b, lam_b,
                                     1e-2, 0.3, 0.2, n_blocks, rem)
    block_until_ready(params_b)
    dt = (time.time() - t0) / n_rep
    itps = steps / dt
    print(f"batch={batch} pf={pf}: window({steps}) = {dt:.2f}s -> "
          f"{itps:.2f} it/s ({itps * batch:.2f} image-it/s)  "
          f"[first call incl compile {t_compile:.1f}s]", flush=True)

    t0 = time.time()
    lo = eval_b(params_b, targets_b, lam_b)
    block_until_ready(lo.loss)
    t_eval_c = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        lo = eval_b(params_b, targets_b, lam_b)
    block_until_ready(lo.loss)
    print(f"  eval_b: {(time.time() - t0) / 3 * 1e3:.1f} ms (first {t_eval_c:.1f}s)",
          flush=True)
    return itps


if __name__ == "__main__":
    which = sys.argv[1:] or ["1x10", "3x10", "3x1000000", "1x1000000"]
    for spec in which:
        b, pf = spec.split("x")
        run(int(b), int(pf))
