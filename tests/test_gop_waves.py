"""GOP dependency waves (parallel/gop.py) vs the coding structure."""

import numpy as np

from coolchic_tpu.parallel.gop import gop_waves, slurm_afterok_equivalent
from coolchic_tpu.utils.codingstructure import CodingStructure


def test_waves_hierarchical_gop9():
    """Classic RA GOP: intra 0 + P 8 + hierarchical Bs."""
    cs = CodingStructure(n_frames=9, intra_pos=[0], p_pos=[8])
    waves = gop_waves(cs)
    # wave 0 = I0; wave 1 = P8; then B4; then B2, B6; then B1 B3 B5 B7
    got = [[f.display_order for f in w] for w in waves]
    assert got == [[0], [8], [4], [2, 6], [1, 3, 5, 7]], got
    # every frame's refs are in strictly earlier waves
    wave_of = {d: k for k, w in enumerate(waves) for f in w
               for d in [f.display_order]}
    for w in waves:
        for f in w:
            for r in f.index_references:
                assert wave_of[r] < wave_of[f.display_order]


def test_waves_parallel_width_beats_serial():
    """The wave count (critical path) is the GOP depth + 1, much shorter
    than the serial coding-order chain the reference walks."""
    cs = CodingStructure(n_frames=17, intra_pos=[0], p_pos=[16])
    waves = gop_waves(cs)
    assert len(waves) == 6  # I, P, B-depth1..4
    assert sum(len(w) for w in waves) == 17
    assert max(len(w) for w in waves) == 8  # widest wave: 8 frames at once
    plan = slurm_afterok_equivalent(cs)
    assert plan.splitlines()[0].startswith("wave 0: I0")


def test_exchange_references_replicates():
    import jax
    from jax.sharding import Mesh

    from coolchic_tpu.parallel.gop import exchange_references

    if len(jax.devices()) < 2:
        return
    mesh = Mesh(np.array(jax.devices()), ("data",))
    dec = {0: jax.numpy.ones((1, 3, 8, 8)), 8: jax.numpy.zeros((1, 3, 8, 8))}
    out = exchange_references(dec, [0, 8], mesh)
    for v in out.values():
        assert v.sharding.is_fully_replicated
