"""Batched multi-image encoding over a device mesh.

Two different tiny images encode as ONE batched program (shard_map over the
"data" axis of a 2-device mesh built from the 8 virtual CPU devices), then
each bitstream must decode back with the encoder-reported PSNR.
"""

import math
import pytest

import jax
import numpy as np

from coolchic_tpu.io.images import read_png
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
from tests.test_e2e import FastPreset

pytestmark = pytest.mark.slow

DATA = "tests/data"


def test_batched_two_images_mesh(tmp_path):
    from jax.sharding import Mesh

    from coolchic_tpu.bitstream.decode import decode_video
    from coolchic_tpu.parallel.encode_batch import encode_images_batched

    base = read_png(f"{DATA}/192x128_kodim15.png")
    arr = np.asarray(base.data)
    flipped = type(base)(bitdepth=8, frame_data_type="rgb", data=arr[:, :, ::-1].copy())
    frames = [base, flipped]

    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], base.img_size)}
    preset = FastPreset(lmbda=1e-3, start_lr=1e-2, itr_main_training=50)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), axis_names=("data",))
    out_paths = [str(tmp_path / "a.cool"), str(tmp_path / "b.cool")]
    results = encode_images_batched(frames, cfgs, preset, out_paths,
                                    mesh=mesh, seed=0, verbose=False, rdoq=False)

    for frame, path, res in zip(frames, out_paths, results):
        dec = decode_video(path)["0"]
        d = np.asarray(dec.data) - np.asarray(frame.data)
        dec_psnr = -10 * math.log10(max(float((d * d).mean()), 1e-10))
        assert abs(dec_psnr - res["psnr_db"]) < 0.3, (dec_psnr, res["psnr_db"])
        assert dec_psnr > 20.0
