#!/usr/bin/env python
"""Generate the 224² SLIC golden fixture (tests/fixtures/slic_golden_224.npz).

VERDICT r3 next-round #1: the production `enforce_connectivity='auto'`
resolves to OFF at 224² on the axon backend (ops/slic.py), deviating from
skimage's `enforce_connectivity=True` default exactly at the reference's
own pretrained-experiment geometry (/root/reference/models/sppp.py:64-65,
117-126 — 224×224 inputs, n_segments=16). This fixture answers, with
committed numbers, what that deviation costs at the granularity SPPP
actually consumes (patch-dominant superpixel ids at patch 16).

Builds seeded structured 224×224 images (smooth color fields + solid
shapes, ImageNet-standardized like the pretrained pipeline) and labels
them with the slow skimage-faithful numpy SLIC oracle (tools/slic_numpy.py)
WITH connectivity enforcement at the reference parameters
(n_segments=16, compactness=0.1, sigma=1.0).

Run from the repo root:  python tools/make_slic_golden_224.py
(one-time; ~1 min — the oracle's Python BFS dominates)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.slic_numpy import slic_numpy  # noqa: E402

# The 224² path is the pretrained-experiment pipeline, which standardizes
# with ImageNet statistics (data/pipeline.py IMAGENET_MEAN/STD; reference
# utils/data_utils.py transforms).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

N_IMAGES = 6
H = W = 224
PARAMS = dict(n_segments=16, compactness=0.1, sigma=1.0)


def make_image(rng: np.random.Generator) -> np.ndarray:
    """Structured 224×224×3 image in [0,1]: smooth field + solid shapes."""
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    for ch in range(3):
        fy, fx = rng.uniform(0.5, 2.0, size=2)
        py, px = rng.uniform(0, 2 * np.pi, size=2)
        img[..., ch] = 0.5 + 0.25 * np.sin(
            2 * np.pi * fy * yy / H + py
        ) * np.cos(2 * np.pi * fx * xx / W + px)
    for _ in range(rng.integers(3, 7)):
        color = rng.uniform(0.05, 0.95, size=3).astype(np.float32)
        if rng.random() < 0.5:
            y0, x0 = rng.integers(0, H - 40, size=2)
            hh, ww = rng.integers(30, 100, size=2)
            img[y0 : y0 + hh, x0 : x0 + ww] = color
        else:
            cy, cx = rng.uniform(30, H - 30, size=2)
            r = rng.uniform(20, 55)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = color
    img += rng.normal(0, 0.02, size=img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def main():
    rng = np.random.default_rng(2026224)
    images = np.stack([make_image(rng) for _ in range(N_IMAGES)])
    std = (images - IMAGENET_MEAN) / IMAGENET_STD
    golden = []
    for i, im in enumerate(std):
        golden.append(slic_numpy(im, **PARAMS))
        print(
            f"image {i}: {int(golden[-1].max()) + 1} segments "
            f"(post-connectivity)",
            flush=True,
        )
    golden = np.stack(golden)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "slic_golden_224.npz",
    )
    np.savez_compressed(
        out,
        images=std.astype(np.float32),
        golden_labels=golden.astype(np.int32),
        n_segments=PARAMS["n_segments"],
        compactness=PARAMS["compactness"],
        sigma=PARAMS["sigma"],
    )
    print(f"wrote {out}: images {std.shape}")


if __name__ == "__main__":
    main()
