"""Matched-RATE Wasserstein A/B (VERDICT r3 weak #5 / next-round item 5).

The round-3 A/B compared the two objectives at one λ, which confounds rate
(the wasserstein arm landed at half the rate). Here each arm sweeps λ to
trace a short RD curve on the SAME ≥192x128 pixels with a real schedule,
then both metrics (PSNR and the He-init VGG16 Wasserstein distortion of the
DECODED images) are compared at matched rate by log-rate interpolation.

Zero-egress caveat unchanged: no ImageNet VGG16 weights exist in this
environment (the reference itself could not run its pretrained objective
here); COOLCHIC_VGG16_NPZ upgrades the features if provided.

Usage: python tools/ab_wasserstein_matched.py [--cpu] [--n_itr 2000]
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
    ap.add_argument("--n_itr", type=int, default=2000)
    ap.add_argument("--lmbdas", default="4e-4,1e-3,4e-3")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.train.encode import encode_image_to_bitstream
    from coolchic_tpu.train.wasserstein import vgg16_features, wasserstein_distortion
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
    from coolchic_tpu.train.presets import PresetIntra

    full = read_png(os.path.join(HERE, "tests/data/192x128_kodim15.png"))
    frame = FrameData(8, "rgb", np.ascontiguousarray(np.asarray(full.data)))
    h, w = frame.img_size
    target = jnp.asarray(frame.data, jnp.float32)
    tfeats = [jax.lax.stop_gradient(f) for f in vgg16_features(target)]

    def wd_of(path):
        dec = jnp.asarray(np.asarray(decode_video(path)["0"].data), jnp.float32)
        d = 0.0
        for fa, fb in zip(vgg16_features(dec), tfeats):
            d = d + wasserstein_distortion(fa, fb)
        return float(d)

    lmbdas = [float(x) for x in args.lmbdas.split(",")]
    curves = {}
    for tag, tune, dw in [
        ("mse", "mse", {"mse": 1.0}),
        ("wasserstein_heinit", "wasserstein",
         {"mse": 0.2, "wasserstein": 0.8 / 200}),
    ]:
        cfgs = {"residue": coolchic_config_from_args(
            INTRA_OPERATING_POINTS["lop"], (h, w), tune=tune)}
        pts = []
        for lam in lmbdas:
            preset = PresetIntra(lmbda=lam, start_lr=1e-2,
                                 itr_main_training=args.n_itr, dist_weight=dw)
            path = f"/tmp/ab_wdm_{tag}_{lam:g}.cool"
            res = encode_image_to_bitstream(frame, cfgs, preset, path, seed=0,
                                            verbose=False, rdoq=False)
            dec = np.asarray(decode_video(path)["0"].data).astype(np.float64)
            mse = float(((dec - np.asarray(frame.data)) ** 2).mean())
            pts.append({"lmbda": lam, "rate_bpp": res["rate_bpp"],
                        "psnr_db": -10 * math.log10(max(mse, 1e-12)),
                        "wd_heinit": wd_of(path)})
            print(tag, pts[-1], flush=True)
        curves[tag] = pts

    # matched-rate comparison: interpolate each metric vs log-rate over the
    # overlapping range, evaluate at the midpoint rates
    def interp(pts, key, rate):
        import numpy as np

        r = np.log([p["rate_bpp"] for p in pts])
        v = np.asarray([p[key] for p in pts])
        o = np.argsort(r)
        return float(np.interp(math.log(rate), r[o], v[o]))

    ra = [p["rate_bpp"] for p in curves["mse"]]
    rb = [p["rate_bpp"] for p in curves["wasserstein_heinit"]]
    lo, hi = max(min(ra), min(rb)), min(max(ra), max(rb))
    matched = []
    if hi > lo:
        for t in (0.25, 0.5, 0.75):
            rate = math.exp(math.log(lo) + t * (math.log(hi) - math.log(lo)))
            matched.append({
                "rate_bpp": round(rate, 4),
                "psnr_mse_arm": round(interp(curves["mse"], "psnr_db", rate), 3),
                "psnr_wd_arm": round(
                    interp(curves["wasserstein_heinit"], "psnr_db", rate), 3),
                "wd_mse_arm": round(interp(curves["mse"], "wd_heinit", rate), 5),
                "wd_wd_arm": round(
                    interp(curves["wasserstein_heinit"], "wd_heinit", rate), 5),
            })

    out = {"n_itr": args.n_itr, "lmbdas": lmbdas, "size": f"{w}x{h}",
           "vgg16_weights": bool(os.environ.get("COOLCHIC_VGG16_NPZ")),
           "curves": curves, "matched_rate": matched,
           "note": "wd arm should win wd_* at matched rate if the He-init "
                   "proxy carries signal; psnr should favor the mse arm"}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
