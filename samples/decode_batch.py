"""Batched decode of many single-frame `tpu`-profile bitstreams on one chip.

Latent grids of the same pyramid level across images decode together inside
one grid-batched Pallas kernel call (up to 8 grids stacked on the sublane
axis; set COOLCHIC_PALLAS_DECODE=1 to enable the on-chip path). The
reference decoder (coolchic/cc_decode.py) is strictly one process per
bitstream; this driver is the TPU-native batch counterpart of
samples/encode_batch.py.

Usage:
  python samples/decode_batch.py -i 'out/*.cool' -o decoded/
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input", required=True,
                        help="glob of .cool bitstreams (quote it)")
    parser.add_argument("-o", "--output", required=True,
                        help="output directory (PNG per bitstream)")
    parser.add_argument("--ext", default="png", choices=["png", "ppm", "yuv"])
    args = parser.parse_args()

    paths = sorted(glob.glob(args.input))
    if not paths:
        parser.error(f"no bitstreams match {args.input!r}")
    os.makedirs(args.output, exist_ok=True)
    outs = [os.path.join(args.output,
                         os.path.splitext(os.path.basename(p))[0]
                         + "." + args.ext)
            for p in paths]

    from coolchic_tpu.bitstream.decode import decode_images

    t0 = time.perf_counter()
    frames = decode_images(paths, outs)
    dt = time.perf_counter() - t0
    n_pix = sum(f.img_size[0] * f.img_size[1] for f in frames)
    print(f"decoded {len(paths)} bitstreams ({n_pix/1e6:.2f} Mpix) "
          f"in {dt:.2f}s -> {n_pix/dt/1e6:.2f} Mpix/s")
    for p, o in zip(paths, outs):
        print(f"  {p} -> {o}")


if __name__ == "__main__":
    main()
