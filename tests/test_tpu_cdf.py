"""Normative lock + properties of the tpu-profile integer model.

The nine constants and the exact op sequence of tpu_cdf.py ARE the format:
any change silently breaks every written tpu-profile bitstream, so this test
pins them and re-proves the properties the decoder relies on.
"""

import numpy as np

from coolchic_tpu.bitstream import tpu_cdf as T


def test_normative_constants_locked():
    assert T.EXP2_POLY == (16777216, -11629077, 4030290, -930970, 160710,
                           -21395, 1835)
    assert T.CSL == 94548
    assert T.SL0 == 14032236
    assert T.LEAK_STEP == 16
    assert T.FREE_WEIGHT == (1 << 24) - 1 - 127 * 16
    # slope table derives from the constants; pin its edges + checksum
    st = T.slope_table()
    assert int(st[0]) == T.SL0 and st.shape == (2561,)
    assert int(st.sum()) == int(np.uint64(st.astype(np.uint64).sum()))


def test_exp2_poly_accuracy():
    u = np.linspace(0, 1, 1 << 14, endpoint=False)
    t = (u * 2**24).astype(np.uint64)
    got = T.exp2_neg24(t).astype(np.float64)
    want = np.round(2.0**24 * 2.0 ** (-u))
    assert np.abs(got - want).max() <= 6  # leak budget is 16


def test_left_cum_strictly_increasing_everywhere_sampled():
    rng = np.random.default_rng(7)
    mus = rng.integers(-64 * 256, 64 * 256 - 1, size=300)
    scales = np.concatenate([np.arange(0, 2561, 7), [0, 2560]])
    s = np.arange(-64, 64)
    mu_g, sc_g, s_g = np.meshgrid(mus, scales, s, indexing="ij")
    lc = T.left_cum(s_g, mu_g, sc_g).astype(np.int64)
    assert (lc[..., 1:] - lc[..., :-1]).min() >= 1
    assert ((1 << 24) - lc[..., -1]).min() >= 1


def test_invert_matches_definition():
    rng = np.random.default_rng(11)
    n = 30000
    q = rng.integers(0, 1 << 24, size=n).astype(np.uint32)
    mu = rng.integers(-64 * 256, 64 * 256 - 1, size=n)
    sc = rng.integers(0, 2561, size=n)
    s, left = T.invert(q, mu, sc)
    assert (T.left_cum(s, mu, sc) <= q).all()
    above = np.where(s < 63, T.left_cum(np.minimum(s + 1, 63), mu, sc) > q, True)
    assert above.all()
    assert (left == T.left_cum(s, mu, sc)).all()


def test_arm8_oracle_matches_native():
    """The numpy X.8 ARM oracle and the C++ batched path agree exactly
    (uniform-input case, i.e. the IFCE-net shape: act_shift applies to all
    columns in both implementations)."""
    from coolchic_tpu.bitstream import rangecoder as rc

    rng = np.random.default_rng(3)
    dim = 12
    layers = [{"weight": rng.integers(-50, 50, size=(dim, dim)),
               "bias": rng.integers(-80, 80, size=(dim,))},
              {"weight": rng.integers(-60, 60, size=(6, dim)),
               "bias": rng.integers(-80, 80, size=(6,))}]
    arm8 = T.arm8_from_int_layers(layers, -7, -14, stabiliser=None,
                                  subtract_last_layer=False,
                                  no_residual_layer=True)
    x = rng.integers(-64, 64, size=(500, dim))
    ref = T.arm8_forward(x, arm8, n_ifce=0)
    got = rc.arm_forward_native(x, arm8, 8, act_shift=8)
    np.testing.assert_array_equal(got, ref)
