#!/usr/bin/env python3
"""Decode a .cool bitstream (reference CLI parity: cc_decode.py).

Example: python cc_decode.py -i bitstream.cool -o decoded.png
"""

import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=True, help=".cool bitstream")
    p.add_argument("-o", "--output", required=True, help="decoded png / ppm / yuv")
    p.add_argument("--verbosity", type=int, default=0)
    args = p.parse_args()

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    decode_video(args.input, decoded_path=args.output, verbosity=args.verbosity)
    print(f"decoded {args.input} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
