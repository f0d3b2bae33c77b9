"""Superpixel patch pooling as static-shape device ops.

The reference implements SPPP with per-image Python dict loops
(PatchToSuperpixelMapper / SuperpixelPooling, reference:
models/sppp.py:77-223): each patch is assigned to the superpixel that covers
most of its pixels, then patch embeddings are pooled per superpixel into a
ragged set of tokens (empty superpixels dropped, token order = first
appearance of each dominant superpixel in raster scan).

TPU rebuild — the shape-regularization decision (SURVEY.md §7 hard part 2):
tokens are indexed *by segment id* 0..R-1 with a fixed R = num_superpixels.

* superpixels that dominate no patch produce an all-zero token (the reference
  initializes pooled embeddings with ``torch.zeros`` and skips empty entries,
  models/sppp.py:165-189 — zeros match that numeric behaviour);
* empty superpixels get the (0.5, 0.5) default centroid exactly as the
  reference does (models/sppp.py:444-447);
* indexing by segment id also aligns each pooled token with its centroid —
  the reference's first-appearance token order is misaligned with its
  id-ordered centroid tensor whenever the raster scan does not visit
  segments in ascending id order; the rebuild fixes that by construction.

Everything here is fixed-shape, vmappable and jittable; the heavy reductions
are one-hot matmuls that land on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def dominant_superpixel_per_patch(
    segmap: jnp.ndarray, patch_size: int, num_segments: int
) -> jnp.ndarray:
    """Per-patch dominant segment id.

    Args:
      segmap: ``[H, W]`` int segment map.
      patch_size: patch side p.
      num_segments: static segment count R.

    Returns:
      ``[N]`` int32 ids, N = (H//p)*(W//p). Matches the reference's
      `torch.unique(...).argmax` dominant rule (models/sppp.py:117-126);
      ties resolve to the smallest segment id (torch.unique sorts ids and
      argmax takes the first maximal count — same rule).
    """
    h, w = segmap.shape
    p = patch_size
    gh, gw = h // p, w // p
    # [gh, gw, p*p] pixel labels per patch
    tiles = segmap.reshape(gh, p, gw, p).transpose(0, 2, 1, 3).reshape(gh * gw, p * p)
    onehot = jax.nn.one_hot(tiles, num_segments, dtype=jnp.int32)  # [N, p², R]
    counts = onehot.sum(axis=1)  # [N, R]
    return jnp.argmax(counts, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("num_segments", "pooling_type"))
def segment_pool(
    patch_embeddings: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    pooling_type: str = "mean",
) -> jnp.ndarray:
    """Pool ``[B, N, D]`` patch embeddings into ``[B, R, D]`` segment tokens.

    Pooling semantics per segment match the reference SuperpixelPooling
    (models/sppp.py:176-189): 'mean', 'max', or 'attention' (softmax over the
    per-patch embedding sums within the segment). Segments owning no patch
    yield zeros.
    """
    if pooling_type not in ("mean", "max", "attention"):
        raise ValueError(f"Unsupported pooling type: {pooling_type}")

    b, n, d = patch_embeddings.shape
    onehot = jax.nn.one_hot(segment_ids, num_segments, dtype=patch_embeddings.dtype)
    # counts[b, r] = number of member patches
    counts = onehot.sum(axis=1)  # [B, R]
    member = counts > 0

    if pooling_type == "mean":
        sums = jnp.einsum(
            "bnr,bnd->brd", onehot, patch_embeddings,
            preferred_element_type=jnp.float32,
        )
        pooled = sums / jnp.maximum(counts, 1.0)[..., None]
        return jnp.where(member[..., None], pooled, 0.0).astype(
            patch_embeddings.dtype
        )

    if pooling_type == "max":
        def seg_max(e, ids):  # e: [N, D], ids: [N]
            return jax.ops.segment_max(
                e.astype(jnp.float32), ids, num_segments=num_segments
            )

        pooled = jax.vmap(seg_max)(patch_embeddings, segment_ids)
        return jnp.where(member[..., None], pooled, 0.0).astype(
            patch_embeddings.dtype
        )

    # attention pooling: per-segment softmax over per-patch embedding sums
    # (reference: models/sppp.py:182-184).
    logits = patch_embeddings.sum(axis=-1).astype(jnp.float32)  # [B, N]
    # Segment-wise stable softmax: subtract each segment's max.
    def seg_softmax(lg, ids):  # lg: [N], ids: [N]
        seg_maxes = jax.ops.segment_max(lg, ids, num_segments=num_segments)
        e = jnp.exp(lg - seg_maxes[ids])
        denom = jax.ops.segment_sum(e, ids, num_segments=num_segments)
        return e / jnp.maximum(denom, 1e-30)[ids]

    weights = jax.vmap(seg_softmax)(logits, segment_ids)  # [B, N]
    pooled = jnp.einsum(
        "bnr,bnd->brd",
        onehot * weights[..., None],
        patch_embeddings,
        preferred_element_type=jnp.float32,
    )
    return jnp.where(member[..., None], pooled, 0.0).astype(
        patch_embeddings.dtype
    )


def superpixel_centroids(
    segmaps: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Normalized (x, y) centroid per segment id.

    Args:
      segmaps: ``[B, H, W]`` int segment maps.

    Returns:
      ``[B, R, 2]`` with channel 0 = x, channel 1 = y, coordinates divided by
      W/H respectively; empty segments default to (0.5, 0.5) — matching the
      reference `_calculate_superpixel_centroids`
      (models/sppp.py:413-449).
    """
    b, h, w = segmaps.shape
    y = (jnp.arange(h, dtype=jnp.float32) / h)[:, None]
    x = (jnp.arange(w, dtype=jnp.float32) / w)[None, :]
    ygrid = jnp.broadcast_to(y, (h, w)).reshape(-1)
    xgrid = jnp.broadcast_to(x, (h, w)).reshape(-1)
    coords = jnp.stack([xgrid, ygrid], axis=-1)  # [H*W, 2]

    onehot = jax.nn.one_hot(
        segmaps.reshape(b, h * w), num_segments, dtype=jnp.float32
    )  # [B, H*W, R]
    counts = onehot.sum(axis=1)  # [B, R]
    sums = jnp.einsum(
        "bpr,pc->brc", onehot, coords, preferred_element_type=jnp.float32
    )  # [B, R, 2]
    centroids = sums / jnp.maximum(counts, 1.0)[..., None]
    return jnp.where(counts[..., None] > 0, centroids, 0.5)
