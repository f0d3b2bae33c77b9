"""SLIC superpixel segmentation as a fixed-shape TPU op.

The reference calls ``skimage.segmentation.slic`` per image on the host,
crossing the device boundary twice per image (reference:
models/sppp.py:44-74). That is the dominant cost of the SPPP pipeline and is
impossible under jit. This rebuild re-derives SLIC as what it fundamentally
is — a grid-seeded, locally-constrained k-means in (color, x, y) space — with
a *fixed* iteration count and *fixed* shapes so the whole SPPP model compiles
into one XLA program.

Faithfulness notes (SURVEY.md §7 hard part 1):

* seeds are placed on a regular grid like skimage's SLIC;
* a Gaussian pre-smoothing with the same ``sigma`` parameter is applied
  (reference passes ``sigma=1.0``, models/sppp.py:64-65);
* the distance metric is the standard SLIC metric
  ``d² = d_color² + (m/S)² · d_xy²`` with compactness m and grid interval S
  (the reference forwards ``compactness`` straight to skimage);
* the per-pixel assignment searches *all* R centroids rather than the 2S×2S
  neighbourhood — with R = 16 segments that is a [H·W, R] distance matrix,
  cheaper on TPU than irregular neighbourhood gathers, and a strict superset
  of the neighbourhood search;
* skimage's final connectivity enforcement is intentionally omitted: the
  SPPP pipeline only consumes the *dominant segment per patch*
  (models/sppp.py:117-126), which is insensitive to stray pixels.

skimage converts RGB inputs to CIELAB before clustering; the reference feeds
it *normalized* tensors (mean/std-standardized, not in [0, 1]), for which LAB
is ill-defined anyway — this implementation clusters in the image's own
channel space scaled to a comparable dynamic range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(round(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur on ``[H, W, C]`` (reflect-ish edge via clamp)."""
    if sigma <= 0:
        return image
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2

    def conv_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="edge")
        # Sliding windows via stacked shifts (kernel is tiny: ~7 taps).
        out = jnp.zeros_like(x)
        for t in range(k.shape[0]):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + x.shape[axis])
            out = out + k[t] * xp[tuple(sl)]
        return out

    out = conv_axis(image.astype(jnp.float32), 0)
    out = conv_axis(out, 1)
    return out.astype(image.dtype)


def _grid_seeds(h: int, w: int, num_segments: int) -> np.ndarray:
    """Regular-grid seed coordinates ``[R, 2]`` (y, x), like SLIC."""
    # Choose a grid shape whose aspect matches the image and whose cell count
    # covers num_segments, then take the first num_segments cells.
    gh = max(1, int(round(np.sqrt(num_segments * h / w))))
    gw = int(np.ceil(num_segments / gh))
    while gh * gw < num_segments:
        gw += 1
    ys = (np.arange(gh) + 0.5) * (h / gh)
    xs = (np.arange(gw) + 0.5) * (w / gw)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    seeds = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
    return seeds[:num_segments].astype(np.float32)


@partial(jax.jit, static_argnames=("num_segments", "n_iter"))
def _slic_single(
    image: jnp.ndarray,
    num_segments: int,
    compactness: float,
    n_iter: int,
) -> jnp.ndarray:
    h, w, c = image.shape
    img = image.astype(jnp.float32)

    # Spatial grid, in pixels.
    ygrid = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)
    ).reshape(-1)
    xgrid = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)
    ).reshape(-1)
    feats = img.reshape(-1, c)  # [P, C]
    p = h * w

    # Grid interval S and the SLIC spatial weight (m/S)².
    interval = float(np.sqrt(h * w / num_segments))
    spatial_w = (compactness / interval) ** 2

    seeds = jnp.asarray(_grid_seeds(h, w, num_segments))  # [R, 2] (y, x)
    seed_yx = seeds
    # Initialize centroid colors by bilinear-free nearest sampling.
    sy = jnp.clip(seed_yx[:, 0].astype(jnp.int32), 0, h - 1)
    sx = jnp.clip(seed_yx[:, 1].astype(jnp.int32), 0, w - 1)
    c_color = img[sy, sx, :]  # [R, C]
    c_pos = seed_yx  # [R, 2]

    def step(_, carry):
        c_color, c_pos = carry
        # [P, R] squared distances.
        d_color = (
            jnp.sum(feats**2, -1, keepdims=True)
            - 2.0 * feats @ c_color.T
            + jnp.sum(c_color**2, -1)[None, :]
        )
        dy = ygrid[:, None] - c_pos[None, :, 0]
        dx = xgrid[:, None] - c_pos[None, :, 1]
        d = d_color + spatial_w * (dy * dy + dx * dx)
        labels = jnp.argmin(d, axis=-1)  # [P]

        onehot = jax.nn.one_hot(labels, num_segments, dtype=jnp.float32)
        counts = jnp.maximum(onehot.sum(0), 1.0)  # [R]
        new_color = (onehot.T @ feats) / counts[:, None]
        new_y = (onehot.T @ ygrid) / counts
        new_x = (onehot.T @ xgrid) / counts
        return new_color, jnp.stack([new_y, new_x], axis=-1)

    c_color, c_pos = jax.lax.fori_loop(0, n_iter, step, (c_color, c_pos))

    # Final assignment.
    d_color = (
        jnp.sum(feats**2, -1, keepdims=True)
        - 2.0 * feats @ c_color.T
        + jnp.sum(c_color**2, -1)[None, :]
    )
    dy = ygrid[:, None] - c_pos[None, :, 0]
    dx = xgrid[:, None] - c_pos[None, :, 1]
    labels = jnp.argmin(d_color + spatial_w * (dy * dy + dx * dx), axis=-1)
    return labels.reshape(h, w).astype(jnp.int32)


def slic_segment(
    images: jnp.ndarray,
    num_segments: int = 16,
    compactness: float = 0.1,
    sigma: float = 1.0,
    n_iter: int = 10,
) -> jnp.ndarray:
    """SLIC-style superpixel segmentation, fully on device.

    Args:
      images: ``[B, H, W, C]`` or ``[H, W, C]`` float image(s) — any
        standardization; clustering runs in the image's channel space.
      num_segments: number of superpixels R (static).
      compactness: SLIC compactness m (reference default 0.1,
        models/sppp.py:31).
      sigma: Gaussian pre-smoothing width (reference passes 1.0).
      n_iter: fixed k-means iteration count.

    Returns:
      int32 segment map ``[B, H, W]`` (or ``[H, W]``), labels in [0, R).
    """
    single = images.ndim == 3
    if single:
        images = images[None]

    def per_image(im):
        im = gaussian_blur(im, sigma)
        return _slic_single(im, num_segments, compactness, n_iter)

    out = jax.vmap(per_image)(images)
    return out[0] if single else out
