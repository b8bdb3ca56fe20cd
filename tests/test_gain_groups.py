"""λ-adaptive encoder gain (reference component/video.py:80-91) and the
sweep's gain-grouped chunking: a chunk must be single-gain (gain is a
static traced constant), and within a group mixed-λ batching still
applies. Regression for the round-4 v3 head-to-head fix (BD-rate
+0.28% -> -2.05%)."""

from coolchic_tpu.train.video import intra_gain_for_lmbda


def test_reference_gain_rule():
    assert intra_gain_for_lmbda(1e-4) == 24
    assert intra_gain_for_lmbda(1.9e-4) == 24
    assert intra_gain_for_lmbda(2e-4) == 20
    assert intra_gain_for_lmbda(4e-4) == 20
    assert intra_gain_for_lmbda(4.9e-4) == 20
    assert intra_gain_for_lmbda(5e-4) == 16
    assert intra_gain_for_lmbda(1e-3) == 16
    assert intra_gain_for_lmbda(2e-2) == 16


def test_sweep_chunks_are_single_gain():
    # mirror samples/encode_kodak_batch.py's grouping on a 6x5 slot grid
    lmbdas = [1e-4, 4e-4, 1e-3, 4e-3, 2e-2]
    slots = list(enumerate(
        [(fi, lm) for fi in range(6) for lm in lmbdas]))
    groups = {}
    for s in slots:
        groups.setdefault(intra_gain_for_lmbda(s[1][1]), []).append(s)
    assert sorted(groups) == [16, 20, 24]
    assert len(groups[24]) == 6      # all images at 1e-4
    assert len(groups[20]) == 6      # all images at 4e-4
    assert len(groups[16]) == 18     # 3 lambdas x 6 images
    chunk = 6
    for gain, g_slots in groups.items():
        for c0 in range(0, len(g_slots), chunk):
            sl = g_slots[c0:c0 + chunk]
            assert {intra_gain_for_lmbda(lm) for _, (_, lm) in sl} == {gain}
    # the gain-16 group still mixes lambdas inside a chunk
    mixed = {lm for _, (_, lm) in groups[16][:chunk]}
    assert len(mixed) > 1
