"""Per-slot λ batching (mixed-rate batch rows).

The sweep batches across images AND rate points: λ is a traced scalar in
the training carry (train.py:_make_fns), so one compile serves a mixed-λ
chunk. Reference analog: one slurm job per (image, λ) pair
(reference samples/encode.py:147-183); here a pair is a batch row.

Pins: slot 0 of a mixed-λ batch is byte-identical to the same slot of a
uniform-λ batch (same seed ⇒ same keys ⇒ same training trajectory), and
the higher-λ slot of the SAME image lands at lower rate.
"""

import pytest

import numpy as np

from coolchic_tpu.io.images import read_png
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
from tests.test_e2e import FastPreset

pytestmark = pytest.mark.slow

DATA = "tests/data"


def _crop(frame, h, w):
    arr = np.asarray(frame.data)[:, :, :h, :w].copy()
    return type(frame)(bitdepth=8, frame_data_type="rgb", data=arr)


def test_mixed_lambda_batch(tmp_path):
    from coolchic_tpu.parallel.encode_batch import encode_images_batched

    base = _crop(read_png(f"{DATA}/192x128_kodim15.png"), 64, 96)
    frames = [base, base]
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], base.img_size)}
    lam_lo, lam_hi = 1e-3, 2e-2
    preset = FastPreset(lmbda=lam_lo, start_lr=1e-2, itr_main_training=120)

    mixed = [str(tmp_path / "m0.cool"), str(tmp_path / "m1.cool")]
    res_mixed = encode_images_batched(frames, cfgs, preset, mixed, seed=0,
                                      verbose=False, rdoq=False,
                                      lmbdas=[lam_lo, lam_hi])

    uniform = [str(tmp_path / "u0.cool"), str(tmp_path / "u1.cool")]
    encode_images_batched(frames, cfgs, preset, uniform, seed=0,
                          verbose=False, rdoq=False)

    with open(mixed[0], "rb") as f:
        b_mixed = f.read()
    with open(uniform[0], "rb") as f:
        b_uniform = f.read()
    assert b_mixed == b_uniform, "slot 0 (same λ, same seed) must be byte-identical"

    # same pixels, ~20x the rate penalty -> strictly smaller bitstream
    assert res_mixed[1]["n_bytes"] < res_mixed[0]["n_bytes"], res_mixed
