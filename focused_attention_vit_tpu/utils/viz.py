"""Visualization helpers (reference: utils/data_utils.py:544-647).

Matplotlib is optional; import is deferred so headless training never pays
for it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _denormalize(images: np.ndarray, mean, std) -> np.ndarray:
    return np.clip(images * np.asarray(std) + np.asarray(mean), 0, 1)


def visualize_images(
    images,
    labels: Optional[Sequence[int]] = None,
    class_names: Optional[Sequence[str]] = None,
    num_images: int = 16,
    mean=(0.4914, 0.4822, 0.4465),
    std=(0.2470, 0.2435, 0.2616),
    save_path: Optional[str] = None,
):
    """Grid plot of (denormalized) NHWC images."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(images)[:num_images]
    images = _denormalize(images, mean, std)
    n = len(images)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(images[i])
            if labels is not None:
                name = (
                    class_names[int(labels[i])]
                    if class_names is not None
                    else str(int(labels[i]))
                )
                ax.set_title(name, fontsize=8)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def visualize_patches(
    image,
    patch_size: int,
    mean=(0.4914, 0.4822, 0.4465),
    std=(0.2470, 0.2435, 0.2616),
    save_path: Optional[str] = None,
):
    """Per-patch grid plot of one NHWC image."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    image = _denormalize(np.asarray(image), mean, std)
    h, w, _ = image.shape
    g = h // patch_size
    fig, axes = plt.subplots(g, g, figsize=(g, g))
    axes = np.atleast_2d(axes)
    for i in range(g):
        for j in range(g):
            axes[i, j].imshow(
                image[
                    i * patch_size : (i + 1) * patch_size,
                    j * patch_size : (j + 1) * patch_size,
                ]
            )
            axes[i, j].axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig
