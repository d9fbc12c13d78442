"""Persistent XLA compilation cache wiring for the CLI entry points.

Backbone cold compiles cost minutes on the TPU (and the remote compile
service is nondeterministic — PERF.md tunnel quirks), so every CLI enables
the on-disk jax compilation cache: the first run per (bucket, program)
pays, subsequent runs load the compiled executable in seconds.
``tools/warm_cache.py`` pre-populates it across the bucket ladder.

Env overrides: AGILE3D_CACHE=0 disables; AGILE3D_CACHE_DIR relocates
(default <repo>/.jax_cache).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at the repo-local persistent compilation cache."""
    if os.environ.get("AGILE3D_CACHE", "1") == "0":
        return None
    import jax

    # TPU backends only: XLA:CPU caches AOT results keyed WITHOUT the host
    # machine's CPU features, so a cache written on one x86 host replays
    # executables with unsupported instructions on another (loud
    # cpu_aot_loader warnings, potential SIGILL). CPU compiles are cheap;
    # the cache exists for the minutes-long TPU backbone compiles.
    if jax.default_backend() == "cpu":
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("AGILE3D_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return cache_dir
