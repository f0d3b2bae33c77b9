"""Positional encodings: fixed sinusoidal and centroid-based dynamic.

Semantics match the reference DynamicPositionalEncoding
(reference: models/sppp.py:226-300):

* without centroids — standard interleaved 1-D sinusoidal encoding
  (reference: models/sppp.py:258-266);
* with centroids — the first half of the embedding is ``sin(x · freq)`` and
  the second half ``cos(y · freq)`` where (x, y) are the normalized
  superpixel centroids; a dummy (0.5, 0.5) centroid is prepended for the
  class token when the centroid count is one short of the sequence
  (reference: models/sppp.py:271-296). The reference comments call this an
  interleave but the executed math is a concat — the concat is what is
  reproduced here (SURVEY.md §2.1 bug list).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_positional_encoding(
    seq_len: int, embed_dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Standard 1-D sinusoidal table ``[S, D]`` (even dims sin, odd cos)."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, embed_dim, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / embed_dim)
    )
    pe = jnp.zeros((seq_len, embed_dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe.astype(dtype)


def centroid_positional_encoding(
    centroids: jnp.ndarray,
    embed_dim: int,
    seq_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Centroid-based encoding ``[B, S, D]`` from ``[B, R, 2]`` centroids.

    Centroid channel 0 is x, channel 1 is y (reference stores x at
    ``centroids[..., 0]``, models/sppp.py:442-443). If ``R < seq_len`` a
    (0.5, 0.5) class-token centroid is prepended.
    """
    b, r, _ = centroids.shape
    if r < seq_len:
        cls = jnp.full((b, seq_len - r, 2), 0.5, dtype=centroids.dtype)
        centroids = jnp.concatenate([cls, centroids], axis=1)
    half = embed_dim // 2
    freq = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / half)
    )
    x_pos = centroids[:, :, 0:1].astype(jnp.float32)  # [B, S, 1]
    y_pos = centroids[:, :, 1:2].astype(jnp.float32)
    pe_x = jnp.sin(x_pos * freq)
    pe_y = jnp.cos(y_pos * freq)
    return jnp.concatenate([pe_x, pe_y], axis=-1).astype(dtype)
