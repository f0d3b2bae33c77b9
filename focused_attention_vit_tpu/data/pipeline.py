"""On-device augmentation + host-side batch iteration.

Transform semantics mirror the reference CIFAR-10 pipeline
(utils/data_utils.py:32-45): RandomCrop(32, padding=4, zero fill) →
RandomHorizontalFlip → Resize(img_size, bilinear) → scale to [0,1] →
Normalize(mean=(0.4914, 0.4822, 0.4465), std=(0.2470, 0.2435, 0.2616)).
Eval: Resize → Normalize.

TPU design: the host only shuffles indices and slices uint8 arrays; all
pixel math runs vectorized on device inside the caller's jit (the train
step fuses augmentation into the forward pass). Random crop/flip use
explicit `jax.random` keys — RNG discipline is key-threading, not global
state (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2470, 0.2435, 0.2616)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _normalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def _resize(x: jnp.ndarray, img_size: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    if h == img_size and w == img_size:
        return x
    return jax.image.resize(
        x, (b, img_size, img_size, c), method="bilinear", antialias=False
    )


def prepare_eval_batch(
    images_u8: jnp.ndarray,
    img_size: int,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 [B, h, w, C] → normalized float [B, img_size, img_size, C]."""
    x = images_u8.astype(dtype) / 255.0
    x = _resize(x, img_size)
    return _normalize(x, mean, std)


def augment_train_batch(
    images_u8: jnp.ndarray,
    key: jax.Array,
    img_size: int,
    crop_padding: int = 4,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Random pad-crop + hflip + resize + normalize, fully on device.

    The pad-crop operates at the native resolution (32² for CIFAR) before
    the resize, matching the reference transform order
    (utils/data_utils.py:33-37).
    """
    b, h, w, c = images_u8.shape
    k_crop, k_flip = jax.random.split(key)

    x = images_u8.astype(dtype) / 255.0
    p = crop_padding
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))  # zero fill

    # Per-image random crop offsets in [0, 2p].
    offs = jax.random.randint(k_crop, (b, 2), 0, 2 * p + 1)

    # Per-image crop as two one-hot selection matmuls. A vmap'd
    # dynamic_slice lowers to a serial per-image `while` loop on TPU
    # (measured ~4 ms/step at batch 128); the one-hot einsum is a tiny
    # batched MXU contraction instead and fuses with the resize.
    iy = offs[:, 0:1] + jnp.arange(h)[None, :]  # [B, h]
    ix = offs[:, 1:2] + jnp.arange(w)[None, :]  # [B, w]
    sel_y = jax.nn.one_hot(iy, h + 2 * p, dtype=dtype)  # [B, h, h+2p]
    sel_x = jax.nn.one_hot(ix, w + 2 * p, dtype=dtype)  # [B, w, w+2p]
    x = jnp.einsum("bih,bhwc->biwc", sel_y, xp)
    x = jnp.einsum("bjw,biwc->bijc", sel_x, x)

    # Per-image horizontal flip with p=0.5.
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

    x = _resize(x, img_size)
    return _normalize(x, mean, std)


def batch_iterator(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Host-side batch slicer over uint8 arrays.

    Training uses ``drop_last=True`` so every step sees a static shape (one
    XLA program); evaluation should use :func:`padded_eval_batches`, which
    keeps static shapes *and* exact full-dataset metrics via a weight mask.
    """
    n = len(images)
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield images[sel], labels[sel]


def padded_eval_batches(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Fixed-shape eval batches with a validity mask.

    The final partial batch is padded by repeating example 0; the mask
    zeroes padded entries out of the metric sums, so loss/accuracy equal
    the unpadded computation exactly.
    """
    n = len(images)
    for start in range(0, n, batch_size):
        sel = np.arange(start, min(start + batch_size, n))
        pad = batch_size - len(sel)
        mask = np.ones(batch_size, dtype=np.float32)
        if pad:
            mask[len(sel):] = 0.0
            sel = np.concatenate([sel, np.zeros(pad, dtype=sel.dtype)])
        yield images[sel], labels[sel], mask
