"""Config system: 3-level priority (defaults < cfg file < CLI), operating
point names vs reference-style cfg files, provenance dump.

Reference parity: cc_encode.py:36-46 (configargparse), cfg/dec/*/*.cfg.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cc_encode import build_parser  # noqa: E402
from coolchic_tpu.utils.configfile import parse_config_file  # noqa: E402
from coolchic_tpu.utils.parsecli import (  # noqa: E402
    INTRA_OPERATING_POINTS,
    coolchic_config_from_args,
)


def _resolve(argv, frame_type="I"):
    parser = build_parser()
    args = parser.parse_args(argv)
    table = INTRA_OPERATING_POINTS
    parser.apply_config(args, args.dec_cfg_residue, table=table, suffix="_residue")
    return parser, args


def test_cfg_file_equals_named_op_point():
    """cfg/dec/intra/hop.cfg must resolve to the same architecture args as
    the named 'hop' operating point."""
    base = ["-i", "x.png", "-o", "x.cool"]
    _, by_name = _resolve(base + ["--dec_cfg_residue", "hop"])
    _, by_file = _resolve(base + ["--dec_cfg_residue",
                                  os.path.join(REPO, "cfg/dec/intra/hop.cfg")])
    keys = ["latent_resolution_residue", "hyperlatent_resolution_residue",
            "arm_residue", "output_feature_ifce_residue",
            "ifce_resolution_residue", "layers_synthesis_residue",
            "ups_k_size_residue", "ups_preconcat_k_size_residue"]
    for k in keys:
        assert getattr(by_name, k) == getattr(by_file, k), k

    # and both make the same CoolChicConfig as the raw table row
    def cfg_of(a):
        return coolchic_config_from_args(
            dict(latent_resolution=str(a.latent_resolution_residue),
                 hyperlatent_resolution=str(a.hyperlatent_resolution_residue),
                 arm=str(a.arm_residue),
                 output_feature_ifce=str(a.output_feature_ifce_residue),
                 ifce_resolution=str(a.ifce_resolution_residue),
                 layers_synthesis=str(a.layers_synthesis_residue),
                 ups_k_size=str(a.ups_k_size_residue),
                 ups_preconcat_k_size=str(a.ups_preconcat_k_size_residue)),
            (128, 192))

    table_cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS["hop"], (128, 192))
    assert cfg_of(by_name) == table_cfg
    assert cfg_of(by_file) == table_cfg


def test_cli_overrides_cfg_file():
    """Explicit CLI flags beat the cfg file; cfg file beats defaults."""
    base = ["-i", "x.png", "-o", "x.cool", "--dec_cfg_residue", "lop"]
    parser, args = _resolve(base + ["--arm_residue", "24,3/stabiliser"])
    # CLI wins over the lop cfg value (6,2/stabiliser)
    assert args.arm_residue == "24,3/stabiliser"
    # cfg wins over the default (hop synthesis) for untyped args
    assert args.layers_synthesis_residue.startswith("8-1-linear-relu")
    prov = parser.format_values()
    assert "arm_residue: '24,3/stabiliser'  (command line)" in prov
    assert "operating point 'lop'" in prov


def test_defaults_are_intra_hop():
    """With no cfg source, the argument defaults are the intra hop point
    (reference cc_encode.py defaults)."""
    parser = build_parser()
    args = parser.parse_args(["-i", "x.png", "-o", "x.cool"])
    assert args.arm_residue == "14,2/stabiliser"
    assert args.output_feature_ifce_residue == 6
    assert args.latent_resolution_residue == "auto"


def test_parse_config_file_syntax(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("; comment\narm_residue = 6,1\n\n"
                 "ups_k_size_residue = 4  # trailing comment\n")
    vals = parse_config_file(str(p))
    assert vals == {"arm_residue": "6,1", "ups_k_size_residue": "4"}


def test_motion_cfg_warp_filter_size_passthrough():
    """MOTION op-point rows carry warp_filter_size without a suffix."""
    parser = build_parser()
    args = parser.parse_args(["-i", "x.yuv", "-o", "x.cool"])
    from coolchic_tpu.utils.parsecli import MOTION_OPERATING_POINTS

    parser.apply_config(args, "mop", table=MOTION_OPERATING_POINTS,
                        suffix="_motion")
    assert args.arm_motion == "6,2/stabiliser"
    assert args.warp_filter_size == 8
