"""Runtime performance configuration for the training/bench entry points.

Two knobs, both applied before any jax key/device use:

* persistent XLA compilation cache (see utils/compile_cache.py);
* ``rbg`` PRNG implementation — dropout mask generation with the default
  threefry costs 136 ms/step on ViT-B/16 @ batch 128 (432 → 679 img/s
  measured on v5e); rbg is the hardware-friendly counter RNG and is also
  partitionable across a mesh. Streams differ from threefry, which this
  framework explicitly does not promise to preserve (SURVEY.md §7 —
  eval-mode parity only, which is RNG-free).

Library users who need threefry semantics simply don't call this.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def configure(
    compilation_cache: bool = True,
    fast_rng: bool = True,
    cache_dir: str | None = None,
) -> None:
    import jax

    if compilation_cache:
        from focused_attention_vit_tpu.utils.compile_cache import enable

        enable(cache_dir)
    if fast_rng:
        try:
            jax.config.update("jax_default_prng_impl", "rbg")
            logger.info("PRNG impl: rbg")
        except Exception as e:  # pragma: no cover
            logger.info("rbg PRNG unavailable: %s", e)
