"""Tracing / profiling hooks (SURVEY.md §5 tracing row).

The reference's only tracing is ``time.time()`` bracketing
(experiments/traditional.py:179, 236-238); this module adds the TPU-native
layer: ``jax.profiler`` trace capture (viewable in TensorBoard/Perfetto)
and named trace annotations, plus a wall-clock context that is
sync-correct on backends where ``block_until_ready`` is unreliable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``profile_dir`` (no-op if None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def wallclock(sink: dict, key: str, result=None) -> Iterator[None]:
    """Sync-correct wall-clock bracket: stores elapsed seconds in
    ``sink[key]``. Pass the computation's output as ``result`` to force
    completion before the clock stops."""
    t0 = time.time()
    yield
    if result is not None:
        jax.block_until_ready(result)
        leaf = jax.tree.leaves(result)[0]
        _ = jax.device_get(leaf.ravel()[:1])
    sink[key] = time.time() - t0
