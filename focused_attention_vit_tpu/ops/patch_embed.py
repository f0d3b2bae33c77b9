"""Patch extraction and linear patch embedding.

Semantics match the reference PatchEmbedding (reference: models/vit.py:19-53):
the image is cut into non-overlapping ``p × p`` patches in row-major order and
each patch is flattened in ``(p1, p2, c)`` order — pixel-major, channel-last —
then linearly projected to the embedding dimension.

TPU notes: the whole op is one reshape/transpose plus a single large GEMM
``[B·N, p²c] × [p²c, D]`` which XLA maps straight onto the MXU. Images are
NHWC (TPU-native layout); the ``(p1 p2 c)`` flattening order is exactly the
natural order of an NHWC patch, so no extra transposes are required.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Cut NHWC images into flattened patches.

    Args:
      images: ``[B, H, W, C]`` array.
      patch_size: side of the square patch; must divide H and W.

    Returns:
      ``[B, N, p*p*C]`` with N = (H//p)*(W//p); patch ``(i, j)`` (row-major)
      is at index ``i*(W//p)+j`` and flattened in (row, col, channel) order,
      matching the reference Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)')
      (reference: models/vit.py:38-39).
    """
    b, h, w, c = images.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"patch_size {p} must divide image dims {(h, w)}")
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    return x.reshape(b, gh * gw, p * p * c)


def patch_embed(
    images: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    patch_size: int,
) -> jnp.ndarray:
    """Patch extraction followed by linear projection.

    Args:
      images: ``[B, H, W, C]``.
      kernel: ``[p*p*C, D]`` projection matrix.
      bias: ``[D]`` or None.

    Returns:
      ``[B, N, D]`` patch embeddings.
    """
    patches = extract_patches(images, patch_size)
    out = jnp.einsum(
        "bnk,kd->bnd", patches, kernel, preferred_element_type=patches.dtype
    )
    if bias is not None:
        out = out + bias
    return out
