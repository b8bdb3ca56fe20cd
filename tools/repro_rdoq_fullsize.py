"""Minimal full-size RDOQ crash repro (512x768 hop, random params).

The batched Kodak sweep crashes the remote TPU worker inside the first
RDOQ device sweep. Training is irrelevant to the crash, so this drives
rdoq_coolchic directly on randomly-initialized (then grid-quantized)
params, with verbose sweeps and per-module timing.

Usage:
  python tools/repro_rdoq_fullsize.py [--host] [--modules arm,ifce,synthesis]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", action="store_true")
    ap.add_argument("--modules", default="arm,ifce,synthesis")
    ap.add_argument("--size", default="512x768")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.host:
        os.environ["COOLCHIC_RDOQ_HOST"] = "1"
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), flush=True)

    from coolchic_tpu.models.coolchic import coolchic_init
    from coolchic_tpu.nnquant.quantize import Q_STEP_SHIFTS  # noqa: F401
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

    h, w = (int(x) for x in args.size.split("x"))
    cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (h, w))
    params = jax.tree_util.tree_map(
        np.asarray, coolchic_init(jax.random.PRNGKey(0), cfg))
    # plausible mid-grid q-steps / orders (values irrelevant to the crash)
    q_shift = {("arm", "weight"): -2, ("arm", "bias"): -4,
               ("ifce", "weight"): -2, ("ifce", "bias"): -4,
               ("upsampling", "weight"): -7, ("upsampling", "bias"): 0,
               ("synthesis", "weight"): -5, ("synthesis", "bias"): -8}
    expgol = {k: 0 for k in q_shift}
    target = np.full((1, 3, h, w), 0.5, np.float32)

    mods = tuple(args.modules.split(","))
    t0 = time.time()
    rdoq_coolchic(params, cfg, q_shift, expgol, 1e-3, target=target,
                  frame_type="I", modules=mods, verbose=True)
    print(f"OK in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
