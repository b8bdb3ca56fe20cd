#!/usr/bin/env python3
"""End-to-end tpu-profile decode throughput on real TPU hardware.

Builds a batch of N kodim14-derived tpu-profile payloads (real latents, real
quantized NN params), runs the fully on-device decoder
(bitstream/device_decode.py) and reports:

  * device program time (words already on device -> images on device),
    the Mpix/s/chip serving metric;
  * first-call wall clock incl. host prep + h2d (amortized per image);
  * bit-exactness of every decoded grid vs the host C++ decode.

Usage: python tools/bench_decode.py [--n 8] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BITSTREAM = "/root/reference/samples/bitstreams/kodim14.cool"


def load_item():
    """kodim14 transcoded to the tpu profile: (header, bytes_nn, payload,
    reference grids)."""
    from coolchic_tpu.bitstream import codec
    from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
    from coolchic_tpu.bitstream.nncodec import decode_network

    raw = open(BITSTREAM, "rb").read()
    _, rest = VideoHeader.read(raw)
    _, rest = FrameHeader.read(rest)
    ch, rest = CoolChicHeader.read(rest)
    cfg = ch.to_config()
    bytes_nn = rest[:ch.nn_n_bytes]
    bytes_latent = rest[ch.nn_n_bytes:ch.nn_n_bytes + ch.n_bytes_latent]
    nn = decode_network(bytes_nn, cfg, ch.nn_q_step_shift, ch.nn_expgol_cnt,
                        ch.nn_n_bit_pad)
    raw_ref, grids_ref = codec.decode_coolchic(ch, bytes_nn, bytes_latent,
                                               profile="ref")
    quantized = [np.asarray(g, dtype=np.int64) for g in grids_ref]
    payload = codec.encode_coolchic_latents(ch, nn, quantized, profile="tpu")
    return ch, bytes_nn, payload, grids_ref, raw_ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    import jax

    from coolchic_tpu.bitstream.device_decode import prepare_batch

    print("transcoding kodim14 to the tpu profile ...", flush=True)
    ch, bytes_nn, payload, grids_ref, raw_ref = load_item()
    items = [(ch, bytes_nn, payload)] * args.n
    n_pix = args.n * ch.to_config().img_size[0] * ch.to_config().img_size[1]

    t0 = time.time()
    batch = prepare_batch(items)
    t_prep = time.time() - t0
    print(f"host prep (parse + NN decode + small grids + h2d): {t_prep*1e3:.0f} ms "
          f"for {args.n} images; device levels {batch.device_levels}", flush=True)

    def sync(x):
        """The axon remote backend's block_until_ready does not wait for
        in-flight executions; fetching a tiny slice does (and device-side
        execution order makes it a barrier for everything queued before)."""
        return np.asarray(jax.device_get(x[:1, :1, :1, :4]))

    t0 = time.time()
    raw, grids = batch.run()
    sync(raw)
    t_first = time.time() - t0
    print(f"first call (incl. compile): {t_first:.1f} s", flush=True)

    if not args.no_check:
        for lvl, g in enumerate(grids):
            got = np.asarray(jax.device_get(g))
            for im in range(args.n):
                np.testing.assert_array_equal(got[im], grids_ref[lvl])
        err = float(np.max(np.abs(np.asarray(jax.device_get(raw))[0]
                                  - np.asarray(raw_ref)[0])))
        print(f"bit-exact grids OK; float tail max |diff| vs host = {err:.2e}",
              flush=True)

    # measure the sync cost itself (fetch of an already-materialized buffer
    # costs one tunnel round-trip; device execution is in-order, so fetching
    # the LAST result of a K-call chain syncs the whole chain)
    t0 = time.time()
    sync(raw)
    t_sync = time.time() - t0

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        raw, grids = batch.run()
        sync(raw)
        best = min(best, time.time() - t0)
    print(f"single batch: {best*1e3:.1f} ms incl. dispatch+sync "
          f"({n_pix/best/1e6:.1f} Mpix/s)", flush=True)

    K = max(args.reps, 5)
    t0 = time.time()
    for _ in range(K):
        raw, grids = batch.run()
    sync(raw)
    dt = (time.time() - t0 - t_sync) / K
    print(f"pipelined x{K}: {dt*1e3:.1f} ms/batch -> "
          f"{n_pix/dt/1e6:.1f} Mpix/s/chip", flush=True)


if __name__ == "__main__":
    main()
