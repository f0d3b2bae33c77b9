"""Patchify / unpatchify utilities (reference: utils/data_utils.py:650-764).

Pure reshape/transpose in both directions, single image and batch; NHWC.
The flattening order matches ops/patch_embed.extract_patches.
"""

from __future__ import annotations

import jax.numpy as jnp

from focused_attention_vit_tpu.ops.patch_embed import extract_patches


def patchify_image(image: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """``[H, W, C]`` or ``[B, H, W, C]`` → ``[(B,) N, p*p*C]``."""
    single = image.ndim == 3
    if single:
        image = image[None]
    out = extract_patches(image, patch_size)
    return out[0] if single else out


def unpatchify_image(
    patches: jnp.ndarray, img_size: int, patch_size: int, channels: int = 3
) -> jnp.ndarray:
    """Inverse of :func:`patchify_image`."""
    single = patches.ndim == 2
    if single:
        patches = patches[None]
    b, n, _ = patches.shape
    g = img_size // patch_size
    x = patches.reshape(b, g, g, patch_size, patch_size, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, img_size, img_size, channels)
    return x[0] if single else x
