"""GOP-level frame parallelism: dependency waves + reference exchange.

The reference's only multi-node story is one subprocess per frame chained
through slurm `afterok` dependencies, with decoded reference frames handed
off via DISK (reference samples/encode.py:147-183, _getcodingstruct.py:
17-91, component/video.py:360-377). The TPU-native equivalent:

  * frames are grouped into WAVES -- every frame whose references were all
    decoded in earlier waves can train NOW. A hierarchical GOP of depth d
    yields d+1 waves, each wave embarrassingly parallel;
  * within a wave, frames shard over the "data" mesh axis (hosts x chips):
    each slice trains its frames' decoders locally;
  * between waves, the decoded reference PIXELS are the only traffic: an
    all-gather of [n_wave, C, H, W] over the data axis (DCN at host scope,
    ICI inside a slice) replaces the reference's disk round-trip.

wave schedule = a topological layering of the reference DAG; pinned by
tests/test_gop_waves.py against the CodingStructure used by the bitstream.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coolchic_tpu.utils.codingstructure import CodingStructure, Frame


def gop_waves(cs: CodingStructure) -> list[list[Frame]]:
    """Frames grouped into dependency waves: wave k holds every frame whose
    references all live in waves < k. Within a wave, frames are independent
    training problems (the parallel width of the GOP)."""
    waves: list[list[Frame]] = []
    placed: dict[int, int] = {}  # display_order -> wave index
    remaining = [cs.get_frame_from_coding_order(i)
                 for i in range(cs.get_max_coding_order() + 1)]
    while remaining:
        ready = [f for f in remaining
                 if all(r in placed for r in f.index_references)]
        assert ready, "cyclic reference structure"
        wave = len(waves)
        for f in ready:
            placed[f.display_order] = wave
        waves.append(sorted(ready, key=lambda f: f.display_order))
        remaining = [f for f in remaining if f.display_order not in placed]
    return waves


def exchange_references(decoded: dict[int, jax.Array], needed: Sequence[int],
                        mesh: Mesh) -> dict[int, jax.Array]:
    """Replicate the decoded frames `needed` across every mesh slice (the
    DCN/ICI reference-pixel exchange between waves). In multi-host JAX the
    same device_put with a replicated sharding moves pixels over DCN; the
    single-process dryrun exercises the identical placement path."""
    rep = NamedSharding(mesh, P())
    return {i: jax.device_put(decoded[i], rep) for i in needed}


def slurm_afterok_equivalent(cs: CodingStructure) -> str:
    """Human-readable wave plan (what the reference emits as an sbatch
    dependency chain, _getcodingstruct.py:17-91)."""
    lines = []
    for k, wave in enumerate(gop_waves(cs)):
        names = ", ".join(f"{f.frame_type}{f.display_order}" for f in wave)
        lines.append(f"wave {k}: {names}")
    return "\n".join(lines)
