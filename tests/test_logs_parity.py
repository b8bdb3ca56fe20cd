"""Reference-schema logging parity (VERDICT r3 item 6).

- detailed_test carries every reference FrameEncoderLogs column family:
  loss breakdown, per-module NN bpp, per-grid/per-feature rates, alpha/beta
  means, prediction dB, spatial-rate summary, timing/metadata columns.
- write_reference_encoder_tsv emits the reference results_encoder.tsv
  column set in the reference order; write_reference_decoder_tsv the
  decoder schema; pretty_string the fixed-width printer.
Also pins the COOLCHIC_VGG16_NPZ upgrade path: an .npz in torchvision
layout is loaded in place of the He-init weights.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
from coolchic_tpu.train.logs import (
    REFERENCE_ENCODER_COLUMNS,
    detailed_test,
    pretty_string,
    write_reference_decoder_tsv,
    write_reference_encoder_tsv,
)
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

# column names of a real reference results_encoder.tsv dump
# (results/round3/ref/kodim15_l1e-3/0000-results_encoder.tsv header)
REF_DUMP_COLUMNS = (
    "loss nn_bpp latent_bpp dist_db psnr_db rate_bpp lmbda time_sec itr "
    "mac_decoded_pixel residue_bpp motion_bpp alpha beta pred_db dummy_pred "
    "img_size n_pixels display_order coding_order frame_offset seq_name "
    + " ".join(f"{cc}_{m}_{wb}_rate_bpp" for cc in ("residue", "motion")
               for m in ("arm", "ifce", "upsampling", "synthesis")
               for wb in ("weight", "bias"))).split()


def _tiny_logs():
    cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS["lop"], (32, 48))
    fcfg = FrameConfig(coolchic_cfg={"residue": cfg})
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    target = jnp.full((1, 3, 32, 48), 0.5, dtype=jnp.float32)
    return detailed_test(params, fcfg, target, lmbda=1e-3,
                         encoding_time_second=1.5, encoding_iterations_cnt=42,
                         seq_name="tiny")


def test_reference_encoder_columns_match_reference_dump():
    assert list(REFERENCE_ENCODER_COLUMNS) == REF_DUMP_COLUMNS


def test_detailed_logs_cover_reference_fields(tmp_path):
    logs = _tiny_logs()
    for k in ("loss", "psnr_db", "rate_bpp", "rate_latent_bpp", "rate_nn_bpp",
              "alpha_mean", "beta_mean", "pred_psnr_db", "dummy_pred_psnr_db",
              "feature_rate_bpp", "spatial_rate_bit_max", "lmbda", "time_sec",
              "itr", "img_size", "n_pixels", "display_order", "coding_order",
              "frame_offset", "seq_name"):
        assert k in logs, k
    assert len(logs["feature_rate_bpp"]) == len(
        coolchic_config_from_args(INTRA_OPERATING_POINTS["lop"],
                                  (32, 48)).size_per_latent)
    assert logs["itr"] == 42 and logs["time_sec"] == 1.5

    enc_path = str(tmp_path / "enc.tsv")
    write_reference_encoder_tsv(enc_path, logs)
    with open(enc_path) as f:
        hdr = f.readline().split()
        vals = f.readline().split()
    assert hdr == REF_DUMP_COLUMNS
    assert len(vals) == len(hdr)

    dec_path = str(tmp_path / "dec.tsv")
    write_reference_decoder_tsv(dec_path, loss=0.0012, psnr_db=31.5,
                                rate_bpp=0.8, lmbda=1e-3, seq_name="tiny",
                                n_pixels=32 * 48)
    with open(dec_path) as f:
        hdr = f.readline().split()
    assert hdr == ["loss", "psnr_db", "rate_bpp", "lmbda", "seq_name",
                   "n_pixels", "display_order", "coding_order"]

    s = pretty_string(logs, show_col_name=True, mode="all")
    head, row = s.split("\n")
    assert "feature_rate_bpp_00" in head
    assert len(head.split()) == len(row.split())
    s_short = pretty_string(logs, show_col_name=True, mode="short")
    assert len(s_short.split("\n")[0].split()) == 7


def test_vgg16_npz_upgrade_path(tmp_path, monkeypatch):
    from coolchic_tpu.train import wasserstein as W

    weights = W._he_init_weights()
    # perturb so a cache/env mixup cannot false-pass
    perturbed = {k: v + 0.125 for k, v in weights.items()}
    npz = str(tmp_path / "vgg16.npz")
    np.savez(npz, **perturbed)
    monkeypatch.setenv("COOLCHIC_VGG16_NPZ", npz)
    W._load_vgg_weights.cache_clear()
    loaded = W._load_vgg_weights()
    for k in weights:
        assert np.allclose(loaded[k], weights[k] + 0.125), k
    x = jnp.full((1, 3, 32, 32), 0.5, dtype=jnp.float32)
    feats = W.vgg16_features(x)
    assert len(feats) == 4 and all(np.isfinite(np.asarray(f)).all()
                                   for f in feats)
    monkeypatch.delenv("COOLCHIC_VGG16_NPZ")
    W._load_vgg_weights.cache_clear()
