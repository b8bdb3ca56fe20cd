"""Warm-up: a candidate tournament over differently-seeded initializations.

Each phase briefly trains the surviving candidates, ranks them by loss and
prunes to the next phase's candidate count; the winner seeds the main
training. Reference parity: coolchic/training/warmup.py.
"""

from __future__ import annotations

from typing import Optional

import jax

from coolchic_tpu.models.frame import FrameConfig
from coolchic_tpu.train.presets import Preset
from coolchic_tpu.train.train import EncoderMonitor, test, train


def warmup(candidates: list[dict], preset: Preset, fcfg: FrameConfig, target, *,
           refs=None, cr=None, key: Optional[jax.Array] = None,
           monitor: Optional[EncoderMonitor] = None, verbose: bool = False) -> dict:
    key = key if key is not None else jax.random.PRNGKey(1)
    monitor = monitor or EncoderMonitor()
    ranked = [{"id": i, "params": p, "loss": None} for i, p in enumerate(candidates)]

    for idx_phase, wu_phase in enumerate(preset.warmup.phases):
        ranked = ranked[: wu_phase.candidates]
        for cand in ranked:
            key, sub = jax.random.split(key)
            cand["params"] = train(cand["params"], fcfg, target, wu_phase.training_phase,
                                   refs=refs, cr=cr, key=sub, monitor=monitor)
            logs = test(cand["params"], fcfg, target, refs=refs, cr=cr,
                        dist_weight=wu_phase.training_phase.dist_weight,
                        lmbda=wu_phase.training_phase.lmbda)
            cand["loss"] = logs.loss
            if verbose:
                print(f"  warmup phase {idx_phase} candidate {cand['id']}: "
                      f"loss {logs.loss * 1e3:.4f} psnr {logs.psnr_db:.3f} "
                      f"bpp {logs.total_rate_latent_bpp:.4f}", flush=True)
        ranked.sort(key=lambda c: c["loss"])

    return ranked[0]["params"]
