"""Persistent XLA compile cache setup for the CLI entry points.

Remote-TPU compiles on this class of host are expensive (tens of seconds to
minutes per executable); tests/conftest.py already pins a persistent cache,
but the train/inference CLIs previously recompiled everything every
invocation. One shared knob so every entry point hits the same cache.
"""

from __future__ import annotations

import os
from pathlib import Path


def setup_compile_cache(cache_dir: str | Path | None = None) -> None:
    """Enable jax's persistent compilation cache (idempotent).

    Default location: $CNG_COMPILE_CACHE, else `.jax_cache/` next to the
    repository root (the directory containing this package).
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "CNG_COMPILE_CACHE",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
