"""Persistent compilation cache (checkpoint/resume analogue, SURVEY §5).

The reference library is stateless per frame; the only expensive state in
this framework is XLA compilation (tens of seconds per program through a
remote compiler).  ``enable_compilation_cache`` persists compiled
executables across processes so a restarted pipeline resumes at full speed
without recompiling — the framework's checkpoint/resume story.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    cache_dir: str = os.path.expanduser("~/.cache/aruco3_tpu/xla"),
    min_compile_time_secs: float = 1.0,
) -> str:
    """Turn on JAX's persistent compilation cache. Returns the directory."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
