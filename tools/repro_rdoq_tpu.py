"""Reproduce / time the round-3 "TPU RDOQ issue" (VERDICT r3 items 1-2).

Trains a tiny budget on 192x128 kodim15 (quality irrelevant), then runs
quantize + RDOQ with per-stage wall-clock and exception capture, on
whatever backend JAX picks (TPU under axon).

Usage: python tools/repro_rdoq_tpu.py [--n_itr 300] [--host]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_itr", type=int, default=300)
    ap.add_argument("--host", action="store_true", help="COOLCHIC_RDOQ_HOST=1")
    ap.add_argument("--lmbda", type=float, default=0.02)
    ap.add_argument("--op", default="hop")
    args = ap.parse_args()
    if args.host:
        os.environ["COOLCHIC_RDOQ_HOST"] = "1"

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.train.presets import PresetDebug, PresetIntra
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )
    from coolchic_tpu.train.encode import encode_image

    frame = load_frame_data_from_file(
        os.path.join(HERE, "tests/data/192x128_kodim15.png"), 0)
    cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS[args.op],
                                    frame.img_size)
    if args.n_itr >= 2000:
        preset = PresetIntra(lmbda=args.lmbda, start_lr=1e-2,
                             itr_main_training=args.n_itr)
    else:
        preset = PresetDebug(lmbda=args.lmbda, start_lr=1e-2,
                             itr_main_training=args.n_itr)

    t0 = time.time()
    try:
        params, fcfg, side, logs = encode_image(
            frame, {"residue": cfg}, preset, seed=0, verbose=True, rdoq=True)
        print(f"OK: psnr {logs.psnr_db:.3f} dB in {time.time()-t0:.1f}s",
              flush=True)
    except Exception:
        print(f"FAILED after {time.time()-t0:.1f}s", flush=True)
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
