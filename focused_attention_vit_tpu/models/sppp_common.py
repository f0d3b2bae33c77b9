"""Shared SPPP token pipeline used by all SPPP-based models.

Implements steps 1-6 of the reference SPPP forward (models/sppp.py:451-497)
as one static-shape device function: SLIC segmentation → patch embedding →
dominant-superpixel assignment → segment pooling → cls token → centroid
computation → dynamic positional encoding. The reference runs the middle
steps in per-image Python loops with host round-trips; here everything is
batched, jittable, and shape-static (R = num_superpixels tokens, empty
segments masked — see ops/segment_pool.py for the regularization decision).
"""

from __future__ import annotations

import jax.numpy as jnp

from focused_attention_vit_tpu.ops import (
    dominant_superpixel_per_patch,
    segment_pool,
    superpixel_centroids,
    centroid_positional_encoding,
    slic_segment,
)

import jax


def sppp_tokens(
    images: jnp.ndarray,
    patch_embeddings: jnp.ndarray,
    cls_token: jnp.ndarray,
    *,
    patch_size: int,
    num_superpixels: int,
    compactness: float,
    pooling_type: str,
    slic_iters: int = 10,
    slic_sigma: float = 1.0,
    slic_connectivity: "bool | str" = "auto",
) -> jnp.ndarray:
    """Build the [B, R+1, D] SPPP token sequence (pos-encoding included).

    Args:
      images: [B, H, W, C] inputs (whatever standardization the data
        pipeline applied — the reference feeds normalized tensors to SLIC).
      patch_embeddings: [B, N, D] from the patch embedder.
      cls_token: [1, 1, D] parameter.

    Returns:
      [B, R+1, D] tokens: cls + segment-id-ordered pooled tokens, with the
      centroid-based positional encoding already added
      (reference: models/sppp.py:464-497).
    """
    b, n, d = patch_embeddings.shape

    # Step 1: SLIC superpixel segmentation, on device.
    segmaps = slic_segment(
        images,
        num_segments=num_superpixels,
        compactness=compactness,
        sigma=slic_sigma,
        n_iter=slic_iters,
        enforce_connectivity=slic_connectivity,
    )  # [B, H, W]

    # Step 3: dominant superpixel per patch → pooled segment tokens.
    seg_ids = jax.vmap(
        lambda m: dominant_superpixel_per_patch(m, patch_size, num_superpixels)
    )(segmaps)  # [B, N]
    pooled = segment_pool(
        patch_embeddings, seg_ids, num_superpixels, pooling_type
    )  # [B, R, D]

    # Step 4: prepend cls token.
    cls = jnp.broadcast_to(cls_token, (b, 1, d)).astype(pooled.dtype)
    tokens = jnp.concatenate([cls, pooled], axis=1)  # [B, R+1, D]

    # Steps 5-6: centroids → dynamic positional encoding.
    centroids = superpixel_centroids(segmaps, num_superpixels)  # [B, R, 2]
    pe = centroid_positional_encoding(
        centroids, d, tokens.shape[1], dtype=tokens.dtype
    )
    return tokens + pe
