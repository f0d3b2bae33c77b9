"""Native C++ batch-prefetcher tests (skipped when no toolchain)."""

import numpy as np
import pytest

from focused_attention_vit_tpu.data.native import (
    NativePrefetcher,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for native batcher"
)


def _data(n=100):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(n, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, size=(n,)).astype(np.int32)
    return images, labels


def test_batches_cover_dataset_without_duplicates():
    images, labels = _data(100)
    pf = NativePrefetcher(images, labels, 32, seed=1)
    seen = []
    for xb, yb in pf.epoch_batches():
        assert xb.shape == (32, 8, 8, 3)
        # Recover identity via exact pixel match against the source.
        for img, lab in zip(xb, yb):
            matches = np.where((images == img).all(axis=(1, 2, 3)))[0]
            assert len(matches) >= 1
            assert labels[matches[0]] == lab
            seen.append(matches[0])
    # drop_last: 3 batches of 32
    assert len(seen) == 96
    assert len(set(seen)) == 96
    pf.close()


def test_epochs_reshuffle():
    images, labels = _data(64)
    pf = NativePrefetcher(images, labels, 64, seed=2)
    e1 = [yb.copy() for _, yb in pf.epoch_batches()]
    e2 = [yb.copy() for _, yb in pf.epoch_batches()]
    assert len(e1) == len(e2) == 1
    assert not np.array_equal(e1[0], e2[0])  # reshuffled order
    assert sorted(e1[0].tolist()) == sorted(e2[0].tolist())
    pf.close()


def test_no_shuffle_preserves_order():
    images, labels = _data(64)
    pf = NativePrefetcher(images, labels, 16, shuffle=False, seed=0)
    out = np.concatenate([yb for _, yb in pf.epoch_batches()])
    np.testing.assert_array_equal(out, labels)
    pf.close()
