"""Pallas wavefront decoder vs the C++ tpu-profile codec (interpret mode).

The kernel must reproduce the C++ decode bit-exactly: same integer CDF
(nine-constant polynomial), same X.8 int32 ARM, same u64 coder semantics
(emulated as u32 pairs in the kernel).
"""

import numpy as np
import pytest

from coolchic_tpu.bitstream import rangecoder as rc
from coolchic_tpu.bitstream.tpu_cdf import arm8_bounds_ok, arm8_from_int_layers
from coolchic_tpu.core.constants import non_zero_pixel_ctx_index

LANES = 128


def _random_arm8(rng, n_spatial, n_ifce, n_hidden=1, stab=False):
    dim = n_spatial + n_ifce
    layers = []
    for _ in range(n_hidden):
        layers.append({"weight": rng.integers(-40, 40, size=(dim, dim)),
                       "bias": rng.integers(-100, 100, size=(dim,))})
    layers.append({"weight": rng.integers(-60, 60, size=(2, dim)),
                   "bias": rng.integers(-100, 100, size=(2,))})
    stabiliser = None
    if stab:
        stabiliser = {"weight": rng.integers(-20, 20, size=(2, dim)),
                      "bias": rng.integers(-50, 50, size=(2,))}
    arm8 = arm8_from_int_layers(layers, -6, -12, stabiliser=stabiliser,
                                subtract_last_layer=True, n_inter_ft_ctx=n_ifce)
    assert arm8_bounds_ok(arm8, np.full(dim, 64.0 * 256.0))
    return arm8


def _roundtrip(h, w, n_spatial, n_ifce, seed, stab=False):
    from coolchic_tpu.ops.pallas_decode import decode_grid_pallas

    rng = np.random.default_rng(seed)
    arm8 = _random_arm8(rng, n_spatial, n_ifce, stab=stab)
    ctx_idx = non_zero_pixel_ctx_index(n_spatial)
    data = rng.integers(-8, 8, size=(h, w)).astype(np.int64)
    ifce = (rng.integers(-2000, 2000, size=(h * w, n_ifce)).astype(np.int64)
            if n_ifce else None)

    encoders = [rc.RangeEncoder() for _ in range(LANES)]
    rc.code_grid_streams(encoders, True, h, w, n_spatial, ifce, arm8, ctx_idx,
                         data=data, model=1)
    stream_bytes = [e.get_bytes() for e in encoders]

    # C++ decode (oracle)
    decoders = [rc.RangeDecoder(b) for b in stream_bytes]
    dec_c = rc.code_grid_streams(decoders, False, h, w, n_spatial, ifce, arm8,
                                 ctx_idx, model=1)
    np.testing.assert_array_equal(dec_c, data)

    # Pallas kernel (interpret mode on CPU)
    words = [np.frombuffer(b, dtype=np.uint32) for b in stream_bytes]
    dec_k = decode_grid_pallas(words, h, w, arm8, ctx_idx, ifce, interpret=True)
    np.testing.assert_array_equal(dec_k, data)


def test_pallas_decode_no_ifce():
    _roundtrip(24, 32, 8, 0, seed=0)


def test_pallas_decode_with_ifce_and_stab():
    _roundtrip(20, 48, 12, 2, seed=1, stab=True)


def test_pallas_decode_grid_batch():
    """G > 1: three heterogeneous grids (different ARM weights, payloads and
    IFCE contexts) decoded in one kernel call (padded to G = 4), each
    bit-exact against its own C++ decode."""
    from coolchic_tpu.ops.pallas_decode import decode_grids_pallas

    h, w, n_spatial, n_ifce = 20, 40, 8, 2
    ctx_idx = non_zero_pixel_ctx_index(n_spatial)
    jobs, datas = [], []
    for seed in (10, 11, 12):
        rng = np.random.default_rng(seed)
        arm8 = _random_arm8(rng, n_spatial, n_ifce, stab=(seed % 2 == 0))
        data = rng.integers(-8, 8, size=(h, w)).astype(np.int64)
        ifce = rng.integers(-2000, 2000, size=(h * w, n_ifce)).astype(np.int64)
        encoders = [rc.RangeEncoder() for _ in range(LANES)]
        rc.code_grid_streams(encoders, True, h, w, n_spatial, ifce, arm8,
                             ctx_idx, data=data, model=1)
        words = [np.frombuffer(e.get_bytes(), dtype=np.uint32)
                 for e in encoders]
        jobs.append({"words": words, "arm8": arm8, "ifce": ifce})
        datas.append(data)

    out = decode_grids_pallas(jobs, h, w, ctx_idx, n_ifce, interpret=True)
    assert len(out) == 3
    for got, want in zip(out, datas):
        np.testing.assert_array_equal(got, want)


def test_pallas_decode_tall():
    # h > 128: multiple y share a lane (in different wavefronts)
    _roundtrip(150, 16, 8, 0, seed=2)
