"""constriction 0.4.2 API shim backed by coolchic_tpu's C++ range coder.

Only the surface used by the reference (`coolchic/bitstream/component/
rangecoder.py`) is provided: stream.model.QuantizedLaplace and
stream.queue.RangeEncoder/RangeDecoder.
"""

from . import stream  # noqa: F401
