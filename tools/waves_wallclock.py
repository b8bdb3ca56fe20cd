"""Wave-parallel vs serial GOP encode: wall-clock + RD (VERDICT r3 item 2).

Encodes the 5-frame mirrored BQSquare clip (I + P + B + 2xB wave) twice
with the production encode_video driver — serial coding-order walk vs
dependency-wave batching — and reports per-mode wall-clock, per-frame RD
and the decoded-bitstream agreement. The wave win comes from the widest
level (B1, B3) training as ONE batched program.

Usage: python tools/waves_wallclock.py [--itr_scale 0.25] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--itr_scale", type=float, default=0.25)
    ap.add_argument("--lmbda", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/waves_ab")
    ap.add_argument("--json_out", default="")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.train.video import encode_video

    # 5-frame clip: mirror the in-repo 3-frame cut (0,1,2,1,0).
    src = os.path.join(HERE, "tests/data/D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv")
    fb = 224 * 128 * 3 // 2
    raw = open(src, "rb").read()
    frames3 = [raw[i * fb:(i + 1) * fb] for i in range(3)]
    os.makedirs(args.out, exist_ok=True)
    clip = os.path.join(args.out, "D-BQSquare-5frames_224x128_60p_yuv420_8b.yuv")
    with open(clip, "wb") as f:
        for i in (0, 1, 2, 1, 0):
            f.write(frames3[i])

    report = {}
    for mode, waves in (("serial", False), ("waves", True)):
        wd = os.path.join(args.out, mode)
        import shutil

        shutil.rmtree(wd, ignore_errors=True)
        bs = os.path.join(args.out, f"{mode}.cool")
        t0 = time.time()
        res = encode_video(clip, bs, wd, n_frames=5, intra_pos=[0], p_pos=[4],
                           lmbda=args.lmbda, itr_scale=args.itr_scale,
                           seed=0, verbose=True, waves=waves)
        wall = time.time() - t0
        decoded = decode_video(bs)
        per_frame = []
        for i in range(5):
            orig = load_frame_data_from_file(clip, i)
            num, den = 0.0, 0
            for k in ("y", "u", "v"):
                d = (np.asarray(decoded[str(i)].data[k])
                     - np.asarray(orig.data[k]))
                num += float((d * d).sum())
                den += d.size
            per_frame.append(round(-10 * math.log10(num / den), 3))
        report[mode] = {"wall_s": round(wall, 1),
                        "n_bytes": res["n_bytes"],
                        "psnr_db_decoded": per_frame}
        print(mode, report[mode], flush=True)

    report["speedup_waves"] = round(
        report["serial"]["wall_s"] / report["waves"]["wall_s"], 3)
    print(json.dumps(report))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
