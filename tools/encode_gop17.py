"""17-frame hierarchical-B GOP encode with wave-parallel training (VERDICT
r4 item 8: deepest GOP >= depth 4, waves of width >= 4, every frame decoded
within the encode gate).

Zero-egress surrogate clip: the 3 real BQSquare frames ping-pong
(0,1,2,1,0,1,...) into 17 frames of genuine back-and-forth motion, GOP 16
(I at 0, P at 16, hierarchical B in between: depths 1..4, widest wave 8).
Per-depth lambda / iteration scaling comes from the production
frame_cfg_args schedule (reference RA operating practice,
reference samples/encode.py:23-70).

Usage:
  python tools/encode_gop17.py --out results/round5/gop17 [--cpu] \
      [--itr_scale 1.0] [--lmbda 1e-3] [--serial]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO3 = os.path.join(HERE, "tests", "data",
                      "D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv")
W, H = 224, 128
FRAME_BYTES = W * H * 3 // 2  # yuv420 8b


def make_clip(out_dir: str, n_frames: int = 17) -> str:
    raw = open(VIDEO3, "rb").read()
    assert len(raw) == 3 * FRAME_BYTES
    frames = [raw[i * FRAME_BYTES:(i + 1) * FRAME_BYTES] for i in range(3)]
    # period-6 ping-pong with repeated turnaround: 0,1,2,2,1,0,0,1,2,...
    # Every step is a real +-1 (or dwell) transition AND the period does not
    # divide the GOP length 16, so the P anchor at display 16 (idx 16%6=4 ->
    # frame 1) encodes genuinely different pixels than its I reference at
    # display 0 (frame 0) -- a period-4 ping-pong would make them identical
    # and turn the P frame into a degenerate copy case.
    pat = [0, 1, 2, 2, 1, 0]
    path = os.path.join(out_dir,
                        f"D-BQSquare-{n_frames}frames_224x128_60p_yuv420_8b.yuv")
    with open(path, "wb") as f:
        for i in range(n_frames):
            f.write(frames[pat[i % 6]])
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/round5/gop17")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lmbda", type=float, default=1e-3)
    ap.add_argument("--itr_scale", type=float, default=1.0)
    ap.add_argument("--n_frames", type=int, default=17)
    ap.add_argument("--serial", action="store_true",
                    help="disable wave batching (A/B or debugging)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        # env var alone does not stick under the axon sitecustomize
        # (tests/conftest.py) -- pin the config too
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.io.io import load_frame_data_from_file
    from coolchic_tpu.train.video import encode_video
    from coolchic_tpu.utils.codingstructure import CodingStructure
    from coolchic_tpu.utils.parsecli import parse_frame_positions

    os.makedirs(args.out, exist_ok=True)
    video = make_clip(args.out, args.n_frames)
    workdir = os.path.join(args.out, "workdir")
    bitstream = os.path.join(args.out, "gop17.cool")

    t0 = time.time()
    res = encode_video(video, bitstream, workdir, n_frames=args.n_frames,
                       intra_pos=[0],
                       p_pos=parse_frame_positions("-1", args.n_frames),
                       lmbda=args.lmbda, itr_scale=args.itr_scale,
                       waves=not args.serial, verbose=True)
    wall = time.time() - t0

    # Decoder-side verification of EVERY frame + per-depth RD table.
    cs = CodingStructure(n_frames=args.n_frames, intra_pos=[0],
                         p_pos=parse_frame_positions("-1", args.n_frames))
    decoded = decode_video(bitstream)
    per_frame, per_depth = [], {}
    for d in range(args.n_frames):
        frame = cs.get_frame_from_display_order(d)
        orig = load_frame_data_from_file(video, d)
        dec = decoded[str(d)]
        num = den = 0.0
        for k in ("y", "u", "v"):
            diff = np.asarray(dec.data[k], np.float64) - \
                np.asarray(orig.data[k], np.float64)
            num += float((diff * diff).sum())
            den += diff.size
        psnr = -10 * math.log10(max(num / den, 1e-12))
        enc = next(r for r in res["results"]
                   if int(r["detailed"]["display_order"]) == d)
        row = {"display_order": d, "frame_type": frame.frame_type,
               "depth": frame.depth, "psnr_dec_db": round(psnr, 4),
               "psnr_enc_db": round(float(enc["logs"].psnr_db), 4),
               "n_bytes": enc["n_bytes"],
               "rate_bpp": round(8 * enc["n_bytes"] / (W * H), 5)}
        per_frame.append(row)
        key = f"{frame.frame_type}_d{frame.depth}"
        per_depth.setdefault(key, []).append(row)

    depth_table = {}
    for key, rows in sorted(per_depth.items()):
        depth_table[key] = {
            "n_frames": len(rows),
            "mean_psnr_dec_db": round(sum(r["psnr_dec_db"] for r in rows)
                                      / len(rows), 4),
            "mean_rate_bpp": round(sum(r["rate_bpp"] for r in rows)
                                   / len(rows), 5),
        }
    gate = max(abs(r["psnr_dec_db"] - r["psnr_enc_db"]) for r in per_frame)
    out = {"video": os.path.basename(video), "n_frames": args.n_frames,
           "lmbda": args.lmbda, "itr_scale": args.itr_scale,
           "waves": not args.serial, "wall_s": round(wall, 1),
           "total_bytes": res["n_bytes"],
           "max_enc_dec_gap_db": round(gate, 4),
           "per_depth": depth_table, "per_frame": per_frame}
    with open(os.path.join(args.out, "gop17.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "per_frame"},
                     indent=1))
    assert gate < 0.3, f"decode gate violated: {gate:.3f} dB"
    print(f"all {args.n_frames} frames decoder-verified within 0.3 dB; "
          f"wall {wall:.1f}s")


if __name__ == "__main__":
    main()
