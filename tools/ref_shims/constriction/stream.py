import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[3]))  # /root/repo

from coolchic_tpu.bitstream import rangecoder as _rc  # noqa: E402


class _QuantizedLaplace:
    def __init__(self, lo: int, hi: int):
        # Our C++ model is specialised to the reference's [-64, 63] range.
        assert (lo, hi) == (-64, 63), (lo, hi)


class _Model:
    QuantizedLaplace = _QuantizedLaplace


class _RangeEncoder:
    def __init__(self):
        self._enc = _rc.RangeEncoder()

    def encode(self, x, model_family, mu, scale):
        self._enc.encode_raw(
            np.asarray(x, dtype=np.int32),
            np.asarray(mu, dtype=np.float64),
            np.asarray(scale, dtype=np.float64),
        )

    def get_compressed(self):
        return np.frombuffer(self._enc.get_bytes(), dtype=np.uint32)


class _RangeDecoder:
    def __init__(self, words):
        words = np.ascontiguousarray(words, dtype=np.uint32)
        self._dec = _rc.RangeDecoder(words.tobytes())

    def decode(self, model_family, mu, scale):
        return self._dec.decode_raw(
            np.asarray(mu, dtype=np.float64), np.asarray(scale, dtype=np.float64)
        )


class _Queue:
    RangeEncoder = _RangeEncoder
    RangeDecoder = _RangeDecoder


model = _Model()
queue = _Queue()
