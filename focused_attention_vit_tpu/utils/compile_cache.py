"""Persistent XLA compilation cache.

Remote compiles on the tunneled TPU cost 30s-8min per program; the cache
makes every recompile of an unchanged program a disk hit across processes
(CLI runs, bench, tests). Call early — before the first jit execution.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/favit_xla_cache")


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FAVIT_XLA_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.info("XLA compilation cache: %s", cache_dir)
    except Exception as e:  # older jax / unsupported backend — non-fatal
        logger.info("compilation cache unavailable: %s", e)
