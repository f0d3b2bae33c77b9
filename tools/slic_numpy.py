"""Slow, pure-numpy SLIC faithful to skimage's algorithm.

skimage is not installable in this environment, so this module re-implements
``skimage.segmentation.slic`` (the Cython `_slic.pyx` loop) step for step to
serve as the *golden oracle* for validating the on-device
``focused_attention_vit_tpu.ops.slic`` implementation (VERDICT round-1
"Missing #5"; reference consumption point: /root/reference/models/sppp.py:44-74
and :117-126).

Faithful pieces (matching skimage 0.2x behaviour):

* Gaussian pre-smoothing with the same ``sigma`` (scipy.ndimage).
* Regular-grid seeding via skimage's ``regular_grid`` step/slice rule.
* The SLIC metric ``d² = (d_xy/step)² + (d_color/m)²`` with the
  ``step = max(step_y, step_x)`` normalization skimage uses.
* The 2S×2S neighbourhood-limited assignment search (per-centroid window of
  ±2·step per axis), 10 iterations, centroid mean updates.
* Post-hoc connectivity enforcement: scan-order BFS relabel with
  ``min_size = 0.5 · segment_size`` merging into the previously adjacent
  label (skimage ``_enforce_label_connectivity_cython`` semantics).

Deliberately *not* reproduced: the RGB→CIELAB conversion. The reference feeds
mean/std-standardized tensors for which LAB is ill-defined; both this oracle
and the device op cluster in the image's own channel space (documented in
ops/slic.py's module docstring).
"""

from __future__ import annotations

import math

import numpy as np
from scipy import ndimage


def _regular_grid_steps(h: int, w: int, n_segments: int):
    """skimage.util.regular_grid for a 2-D shape: per-dim step sizes.

    Returns (step_y, step_x, start_y, start_x) such that seeds sit at
    ``start + k * step`` per axis (skimage uses ``slice(step//2, None, step)``).
    """
    space_size = float(h * w)
    step = (space_size / n_segments) ** 0.5
    # skimage sorts dims and can shrink the step for small dims; for the
    # near-square images SPPP feeds (32×32, 224×224) the isotropic step is
    # exact.
    step_y = int(round(step)) or 1
    step_x = int(round(step)) or 1
    return step_y, step_x, step_y // 2, step_x // 2


def slic_numpy(
    image: np.ndarray,
    n_segments: int = 16,
    compactness: float = 0.1,
    sigma: float = 1.0,
    max_iter: int = 10,
    enforce_connectivity: bool = True,
    min_size_factor: float = 0.5,
) -> np.ndarray:
    """skimage-faithful SLIC on one ``[H, W, C]`` float image → int labels.

    Labels are sequential component ids (0-based) after connectivity
    enforcement, exactly like ``skimage.segmentation.slic(..., start_label=0)``.
    """
    image = np.asarray(image, dtype=np.float64)
    h, w, c = image.shape

    if sigma > 0:
        image = ndimage.gaussian_filter(image, sigma=(sigma, sigma, 0))

    step_y, step_x, start_y, start_x = _regular_grid_steps(h, w, n_segments)
    ys = np.arange(start_y, h, step_y)
    xs = np.arange(start_x, w, step_x)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    cy = cy.reshape(-1).astype(np.float64)
    cx = cx.reshape(-1).astype(np.float64)
    n = cy.size
    ccolor = image[cy.astype(int), cx.astype(int), :]  # [n, C]

    step = float(max(step_y, step_x))
    # skimage scales color by 1/compactness and space by 1/step, then uses a
    # plain squared euclidean metric.
    inv_m = 1.0 / compactness
    inv_s = 1.0 / step

    yy = np.arange(h, dtype=np.float64)
    xx = np.arange(w, dtype=np.float64)

    labels = -np.ones((h, w), dtype=np.int64)
    for _ in range(max_iter):
        dist = np.full((h, w), np.inf)
        labels[...] = -1
        for k in range(n):
            y_min = max(int(cy[k] - 2 * step_y), 0)
            y_max = min(int(cy[k] + 2 * step_y) + 1, h)
            x_min = max(int(cx[k] - 2 * step_x), 0)
            x_max = min(int(cx[k] + 2 * step_x) + 1, w)
            patch = image[y_min:y_max, x_min:x_max, :]
            dc = ((patch - ccolor[k]) * inv_m) ** 2
            dy = ((yy[y_min:y_max] - cy[k]) * inv_s) ** 2
            dx = ((xx[x_min:x_max] - cx[k]) * inv_s) ** 2
            d = dc.sum(-1) + dy[:, None] + dx[None, :]
            win_d = dist[y_min:y_max, x_min:x_max]
            win_l = labels[y_min:y_max, x_min:x_max]
            better = d < win_d
            win_d[better] = d[better]
            win_l[better] = k
        # Centroid update (pixels no centroid reached keep label -1 and do
        # not contribute, as in skimage's loop where they are re-covered by
        # the next assignment pass).
        for k in range(n):
            mask = labels == k
            if not mask.any():
                continue
            ky, kx = np.nonzero(mask)
            cy[k] = ky.mean()
            cx[k] = kx.mean()
            ccolor[k] = image[ky, kx, :].mean(axis=0)

    # Unreached pixels (possible when seeds collapse): nearest centroid,
    # unrestricted — mirrors skimage's guarantee that every pixel is labelled.
    if (labels < 0).any():
        ky, kx = np.nonzero(labels < 0)
        feats = image[ky, kx, :]
        d = ((feats[:, None, :] - ccolor[None]) * inv_m) ** 2
        d = d.sum(-1)
        d += ((ky[:, None] - cy[None]) * inv_s) ** 2
        d += ((kx[:, None] - cx[None]) * inv_s) ** 2
        labels[ky, kx] = d.argmin(-1)

    if enforce_connectivity:
        segment_size = h * w / n_segments
        min_size = int(round(min_size_factor * segment_size))
        labels = _enforce_connectivity(labels, min_size)
    return labels.astype(np.int32)


def _enforce_connectivity(labels: np.ndarray, min_size: int) -> np.ndarray:
    """skimage ``_enforce_label_connectivity_cython`` semantics.

    Scan-order BFS flood fill (4-connectivity) assigning sequential new
    labels; components smaller than ``min_size`` are merged into the adjacent
    label seen most recently before the component (skimage keeps the label of
    the last examined adjacent segment).
    """
    h, w = labels.shape
    out = -np.ones_like(labels)
    next_label = 0
    for sy in range(h):
        for sx in range(w):
            if out[sy, sx] >= 0:
                continue
            # BFS over the same-input-label component.
            comp = [(sy, sx)]
            out[sy, sx] = next_label
            adjacent = -1
            head = 0
            while head < len(comp):
                y, x = comp[head]
                head += 1
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if not (0 <= ny < h and 0 <= nx < w):
                        continue
                    if out[ny, nx] < 0 and labels[ny, nx] == labels[sy, sx]:
                        out[ny, nx] = next_label
                        comp.append((ny, nx))
                    elif out[ny, nx] >= 0 and out[ny, nx] != next_label:
                        adjacent = out[ny, nx]
            if len(comp) < min_size and adjacent >= 0:
                for y, x in comp:
                    out[y, x] = adjacent
            else:
                next_label += 1
    # Compact label ids (merges can leave gaps).
    uniq = np.unique(out)
    remap = np.zeros(uniq.max() + 1, dtype=np.int64)
    remap[uniq] = np.arange(uniq.size)
    return remap[out]
