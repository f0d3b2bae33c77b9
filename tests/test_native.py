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


def test_ragged_tail_epoch_terminates():
    """drop_last=False with n % batch != 0: the worker must still emit
    the end-of-epoch sentinel (a step-by-batch `start <= limit` loop
    skipped it, fusing epochs forever)."""
    images, labels = _data(10)
    pf = NativePrefetcher(images, labels, 4, drop_last=False, seed=3)
    counts = [len(yb) for _, yb in pf.epoch_batches()]
    assert counts == [4, 4, 2]
    # and the next epoch is again a fresh, terminating epoch
    counts2 = [len(yb) for _, yb in pf.epoch_batches()]
    assert counts2 == [4, 4, 2]
    pf.close()


def test_generator_after_close_stops():
    """A live epoch generator after close() must stop, not call into the
    freed C++ object."""
    images, labels = _data(64)
    pf = NativePrefetcher(images, labels, 16, seed=4)
    gen = pf.epoch_batches()
    next(gen)
    pf.close()
    assert list(gen) == []


def test_non_uint8_rejected():
    images, labels = _data(16)
    with pytest.raises(TypeError, match="uint8"):
        NativePrefetcher(images.astype(np.float32), labels, 8)
