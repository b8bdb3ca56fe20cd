"""Quantify the He-init Wasserstein objective (VERDICT r2 item 9).

Context: the reference trains --tune=wasserstein against ImageNet-VGG16
features (reference coolchic/training/metrics/wasserstein.py:45-75). This
environment has ZERO egress and no torchvision/VGG16 checkpoint anywhere on
disk, so NEITHER side can run the pretrained objective here — the reference
encoder would fail at the weight download. What CAN be measured is the
effect of our substitute (random He-init VGG16 feature pyramid,
train/wasserstein.py:48-69) against the plain-MSE objective at matched λ
and budget, on the same crop:

  A. mse-only        dist = mse
  B. wd (He-init)    dist = 0.2*mse + (0.8/200)*wasserstein   (ref mix)

Reported: PSNR / rate for both, plus the Wasserstein distortion of A and B
decoded outputs under the SAME He-init features (does optimizing the proxy
move the proxy metric?). Supplying COOLCHIC_VGG16_NPZ upgrades both the
objective and this report to the pretrained features with no code change.

Usage: python tools/ab_wasserstein.py [--cpu] [--n_itr 300] [--size 64x96]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_itr", type=int, default=300)
    ap.add_argument("--size", default="64x96")
    ap.add_argument("--lmbda", type=float, default=1e-3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))

    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.train.wasserstein import vgg16_features, wasserstein_distortion
    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
    from tests.test_e2e import FastPreset

    h, w = (int(x) for x in args.size.split("x"))
    full = read_png(os.path.join(HERE, "tests/data/192x128_kodim15.png"))
    frame = FrameData(8, "rgb", np.ascontiguousarray(
        np.asarray(full.data)[:, :, :h, :w]))
    target = jnp.asarray(frame.data, jnp.float32)  # FrameData is [0,1]

    def wd_of(dec_path):
        dec = jnp.asarray(np.asarray(decode_video(dec_path)["0"].data),
                          jnp.float32)
        d = 0.0
        for fa, fb in zip(vgg16_features(dec), vgg16_features(target)):
            d = d + wasserstein_distortion(fa, fb)
        return float(d)

    rows = {}
    for tag, tune, dw in [
        ("mse", "mse", {"mse": 1.0}),
        ("wasserstein_heinit", "wasserstein", {"mse": 0.2, "wasserstein": 0.8 / 200}),
    ]:
        cfgs = {"residue": coolchic_config_from_args(
            INTRA_OPERATING_POINTS["lop"], (h, w), tune=tune)}
        preset = FastPreset(lmbda=args.lmbda, start_lr=1e-2,
                            itr_main_training=args.n_itr, dist_weight=dw)
        path = f"/tmp/ab_wd_{tag}.cool"
        res = encode_image_to_bitstream(frame, cfgs, preset, path, seed=0,
                                        verbose=False, rdoq=False)
        dec = np.asarray(decode_video(path)["0"].data).astype(np.float64)
        mse = float(((dec - np.asarray(frame.data)) ** 2).mean())
        rows[tag] = {
            "psnr_db": round(-10 * math.log10(max(mse, 1e-12)), 3),
            "rate_bpp": round(res["rate_bpp"], 4),
            "wd_heinit_of_decode": round(wd_of(path), 4),
        }
        print(tag, rows[tag], flush=True)

    out = {"n_itr": args.n_itr, "lmbda": args.lmbda, "size": args.size,
           "vgg16_weights": bool(os.environ.get("COOLCHIC_VGG16_NPZ")),
           "rows": rows}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
