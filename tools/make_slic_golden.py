#!/usr/bin/env python
"""Generate the SLIC golden fixture (tests/fixtures/slic_golden.npz).

Builds seeded, structured CIFAR-shaped images (smooth color fields +
geometric regions, then CIFAR mean/std standardization — the tensor
distribution the reference hands to skimage.slic at
/root/reference/models/sppp.py:64-65) and labels them with the slow
skimage-faithful numpy SLIC oracle (tools/slic_numpy.py) at the reference
parameters (n_segments=16, compactness=0.1, sigma=1.0).

Run from the repo root:  python tools/make_slic_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.slic_numpy import slic_numpy  # noqa: E402

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)

N_IMAGES = 8
H = W = 32
PARAMS = dict(n_segments=16, compactness=0.1, sigma=1.0)


def make_image(rng: np.random.Generator) -> np.ndarray:
    """Structured 32×32×3 image in [0,1]: smooth field + 2-4 solid shapes."""
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    # Smooth low-frequency background per channel.
    for ch in range(3):
        fy, fx = rng.uniform(0.5, 2.0, size=2)
        py, px = rng.uniform(0, 2 * np.pi, size=2)
        img[..., ch] = 0.5 + 0.25 * np.sin(2 * np.pi * fy * yy / H + py) * np.cos(
            2 * np.pi * fx * xx / W + px
        )
    # Solid shapes (rectangles / discs) with distinct colors.
    for _ in range(rng.integers(2, 5)):
        color = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
        if rng.random() < 0.5:
            y0, x0 = rng.integers(0, H - 8, size=2)
            hh, ww = rng.integers(6, 16, size=2)
            img[y0 : y0 + hh, x0 : x0 + ww] = color
        else:
            cy, cx = rng.uniform(4, H - 4, size=2)
            r = rng.uniform(3, 8)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = color
    img += rng.normal(0, 0.02, size=img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def main():
    rng = np.random.default_rng(2026)
    images = np.stack([make_image(rng) for _ in range(N_IMAGES)])
    std = (images - CIFAR_MEAN) / CIFAR_STD  # the distribution SLIC sees
    golden = np.stack([slic_numpy(im, **PARAMS) for im in std])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "slic_golden.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        images=std.astype(np.float32),
        golden_labels=golden.astype(np.int32),
        n_segments=PARAMS["n_segments"],
        compactness=PARAMS["compactness"],
        sigma=PARAMS["sigma"],
    )
    print(
        f"wrote {out}: images {std.shape}, "
        f"label counts {[int(g.max()) + 1 for g in golden]}"
    )


if __name__ == "__main__":
    main()
