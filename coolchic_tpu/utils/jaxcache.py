"""Persistent XLA compilation cache shared by every entry point.

The first jit of a given (architecture, image size) pays a large XLA
compile; caching it on disk makes every later process start warm. The
reference relies on torch.compile re-tracing per process
(coolchic/component/video.py:252-263) -- on TPU we can do better because
XLA's serialized executables are keyed by HLO hash and restored in
milliseconds.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Idempotent: point JAX's persistent compilation cache at `cache_dir`
    (default: <repo>/.jax_cache, overridable with $COOLCHIC_JAX_CACHE)."""
    import jax

    path = Path(cache_dir or os.environ.get("COOLCHIC_JAX_CACHE", _DEFAULT_DIR))
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
