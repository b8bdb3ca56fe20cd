#!/usr/bin/env python3
"""Profile the Pallas wavefront decode kernel on real TPU hardware.

Transcodes the reference kodim14 latents into the `tpu` profile (real
payloads, real quantized ARM/IFCE), then times decode_grids_pallas per grid
shape and batch size, with optional stage ablation:

  python tools/bench_pallas.py                 # timing table, G in {1, 8}
  COOLCHIC_ABLATE=arm python tools/bench_pallas.py   # stub the ARM stage
  python tools/bench_pallas.py --ablate-sweep  # differential per-stage cost

Ablated runs produce garbage output (timing only); the unablated runs are
verified bit-exact against the host C++ decode.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BITSTREAM = "/root/reference/samples/bitstreams/kodim14.cool"


def load_jobs():
    """Real per-grid tpu-profile decode jobs from kodim14 (hop arch)."""
    from coolchic_tpu.bitstream import codec, rangecoder as rc
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
    from coolchic_tpu.bitstream.nncodec import decode_network
    from coolchic_tpu.core.constants import non_zero_pixel_ctx_index

    raw = open(BITSTREAM, "rb").read()
    _, rest = VideoHeader.read(raw)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    nn = decode_network(bytes_nn, cfg, ch.nn_q_step_shift, ch.nn_expgol_cnt,
                        ch.nn_n_bit_pad)
    _, grids_ref = codec.decode_coolchic(ch, bytes_nn, bytes_latent, profile="ref")
    quantized = [np.asarray(g, dtype=np.int64) for g in grids_ref]
    payload = codec.encode_coolchic_latents(ch, nn, quantized, profile="tpu")

    arm8 = codec._main_arm_params(nn, ch, cfg, 1)
    ctx_idx = non_zero_pixel_ctx_index(cfg.spatial_context_arm)

    # Parse the per-grid stream blocks (coarse -> fine) and rebuild each
    # grid's IFCE context from the already-decoded coarser grids.
    jobs = []
    cursor = 0
    decoded = []
    for level in range(cfg.n_latent_grids - 1, -1, -1):
        h_i, w_i = cfg.size_per_latent[level]
        ifce_ctx = codec._ifce_context_for_grid(nn, cfg, ch, level, decoded,
                                                h_i, w_i, model=1)
        n_streams = payload[cursor]
        cursor += 1
        counts = np.frombuffer(payload, dtype="<u4", offset=cursor, count=n_streams)
        cursor += 4 * n_streams
        words = []
        for c in counts:
            words.append(np.frombuffer(payload, dtype=np.uint32,
                                       offset=cursor, count=int(c)).copy())
            cursor += 4 * int(c)
        decoded.insert(0, np.asarray(grids_ref[level], dtype=np.int64))
        if n_streams == 128:
            jobs.append({
                "level": level, "h": h_i, "w": w_i,
                "job": {"words": words, "arm8": arm8, "ifce": ifce_ctx},
                "want": np.asarray(grids_ref[level], dtype=np.int64),
                "ctx_idx": ctx_idx,
                "n_ifce": 0 if ifce_ctx is None else int(ifce_ctx.shape[-1]),
            })
    return jobs


def time_decode(entry, G: int, n_rep: int = 3, check: bool = True):
    from coolchic_tpu.ops import pallas_decode as pd

    h, w = entry["h"], entry["w"]
    jobs = [dict(entry["job"]) for _ in range(G)]
    # warm-up (compile)
    out = pd.decode_grids_pallas(jobs, h, w, entry["ctx_idx"], entry["n_ifce"])
    if check and not pd._ABLATE:
        for g in out:
            np.testing.assert_array_equal(g, entry["want"])
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.time()
        out = pd.decode_grids_pallas(jobs, h, w, entry["ctx_idx"], entry["n_ifce"])
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate-sweep", action="store_true")
    ap.add_argument("--g", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from coolchic_tpu.ops import pallas_decode as pd

    ablate_env = os.environ.get("COOLCHIC_ABLATE", "")
    if ablate_env:
        pd._ABLATE = frozenset(x for x in ablate_env.split(",") if x)
        pd._build.cache_clear()

    print("loading kodim14 tpu-profile jobs ...", flush=True)
    jobs = load_jobs()
    for e in jobs:
        print(f"  grid level {e['level']}: {e['h']}x{e['w']}, "
              f"{sum(len(ws) for ws in e['job']['words'])} words, "
              f"n_ifce={e['n_ifce']}")

    if args.ablate_sweep:
        stages = ["", "taps", "arm", "div", "search", "refill",
                  "taps,arm,div,search,refill"]
        e = jobs[0]
        print(f"\nablation sweep on grid {e['h']}x{e['w']} (G=1):")
        for st in stages:
            pd._ABLATE = frozenset(x for x in st.split(",") if x)
            pd._build.cache_clear()
            dt = time_decode(e, 1, n_rep=args.reps, check=False)
            print(f"  ablate [{st or 'none':>30}]: {dt * 1e3:8.2f} ms", flush=True)
        return

    print("\ntiming (bit-exact checked on unablated runs):")
    for e in jobs:
        px = e["h"] * e["w"]
        for G in args.g:
            dt = time_decode(e, G, n_rep=args.reps)
            print(f"  {e['h']:4d}x{e['w']:<4d} G={G}: {dt * 1e3:8.2f} ms  "
                  f"{G * px / dt / 1e6:8.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
