"""ctypes bindings for the native C++ batch prefetcher (native/batcher.cpp).

The shared library is built on first use with the system g++ (no pybind11
dependency; plain C ABI) and cached next to the source. Everything degrades
gracefully: if no compiler is available the pure-numpy iterator in
data/pipeline.py is used instead.
"""

from __future__ import annotations

import ctypes
import logging
import os
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from focused_attention_vit_tpu.utils.native_build import REPO_ROOT, NativeLib

logger = logging.getLogger(__name__)


def _configure(lib: ctypes.CDLL) -> None:
    lib.favit_prefetcher_create.restype = ctypes.c_void_p
    lib.favit_prefetcher_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.favit_prefetcher_next.restype = ctypes.c_int64
    lib.favit_prefetcher_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.favit_prefetcher_destroy.argtypes = [ctypes.c_void_p]


_NATIVE = NativeLib(
    src=os.path.join(REPO_ROOT, "native", "batcher.cpp"),
    lib=os.path.join(REPO_ROOT, "native", "libfavit_batcher.so"),
    name="batcher",
    configure=_configure,
)


def get_lib() -> Optional[ctypes.CDLL]:
    return _NATIVE.get()


def native_available() -> bool:
    return _NATIVE.available()


class NativePrefetcher:
    """Background-threaded shuffled batch iterator over host uint8 arrays.

    One instance persists across epochs (`epoch_batches()` yields one
    epoch); the C++ worker keeps `depth` assembled batches ahead of the
    consumer, overlapping host gather with device steps.
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        depth: int = 4,
        seed: int = 0,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native batcher unavailable")
        self._lib = lib
        # Own contiguous copies: the C++ side holds raw pointers. The
        # byte-level gather assumes uint8 items (anything else would
        # silently copy the wrong byte count per image).
        if images.dtype != np.uint8:
            raise TypeError(
                f"NativePrefetcher requires uint8 images, got {images.dtype}"
            )
        self._images = np.ascontiguousarray(images)
        self._labels = np.ascontiguousarray(labels.astype(np.int32))
        self.batch_size = batch_size
        self.item_shape = self._images.shape[1:]
        item_bytes = int(self._images[0].nbytes) if len(self._images) else 0
        self._handle = lib.favit_prefetcher_create(
            self._images.ctypes.data_as(ctypes.c_void_p),
            self._labels.ctypes.data_as(ctypes.c_void_p),
            len(self._images),
            item_bytes,
            batch_size,
            depth,
            seed,
            int(shuffle),
            int(drop_last),
        )
        self._item_bytes = item_bytes
        self._out_img = np.empty((batch_size, *self.item_shape), dtype=np.uint8)
        self._out_lab = np.empty((batch_size,), dtype=np.int32)
        self._closed = False
        self._close_lock = threading.Lock()

    def epoch_batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            if self._closed:
                # A live generator after close() must stop, not call into
                # the freed C++ object (use-after-free).
                return
            n = self._lib.favit_prefetcher_next(
                self._handle,
                self._out_img.ctypes.data_as(ctypes.c_void_p),
                self._out_lab.ctypes.data_as(ctypes.c_void_p),
            )
            if n <= 0:  # 0 = end of epoch, -1 = shutting down
                return
            # Copy out: the staging buffers are reused for the next batch.
            yield self._out_img[:n].copy(), self._out_lab[:n].copy()

    def close(self):
        # Serialize concurrent closes (e.g. a GC finalizer on another
        # thread racing an explicit close) so the handle cannot be
        # double-freed; destroy itself blocks until any in-flight Next()
        # copy drains (batcher.cpp ~Prefetcher active_readers_ wait).
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        self._lib.favit_prefetcher_destroy(self._handle)

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
