"""ctypes binding for the native host-side SLIC connectivity enforcement
(native/connectivity.cpp — skimage ``_enforce_label_connectivity_cython``
semantics, threaded over the batch).

Built on first use with the system g++ (plain C ABI, no pybind11), cached
next to the source; degrades gracefully to ``None`` when no compiler is
available (callers fall back to the on-device enforcement or skip).

Why this exists: connectivity enforcement is scan-order BFS + merging —
pointer-chasing that costs seconds on the TPU at 224² (every [H·W]-table
gather ~65 ms, scatter ~260 ms at batch 128; BASELINE.md round 3) and
milliseconds on host cores. The reference gets it for free from skimage's
Cython (/root/reference/models/sppp.py:64-65); this is the TPU-native
equivalent of that native dependency.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from focused_attention_vit_tpu.utils.native_build import REPO_ROOT, NativeLib


def _configure(lib: ctypes.CDLL) -> None:
    lib.favit_enforce_connectivity.restype = ctypes.c_int
    lib.favit_enforce_connectivity.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]


_NATIVE = NativeLib(
    src=os.path.join(REPO_ROOT, "native", "connectivity.cpp"),
    lib=os.path.join(REPO_ROOT, "native", "libfavit_connectivity.so"),
    name="connectivity",
    configure=_configure,
)


def get_lib():
    return _NATIVE.get()


def native_available() -> bool:
    return _NATIVE.available()


def enforce_connectivity_host(
    labels: np.ndarray, min_size: int, max_labels: int, n_threads: int = 0
) -> np.ndarray:
    """Enforce connectivity on host for int32 labels ``[B, H, W]``
    (or ``[H, W]``). Exact skimage BFS semantics + the ops/slic.py
    reduce-to-≤R rule; see native/connectivity.cpp."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native connectivity library unavailable")
    single = labels.ndim == 2
    arr = np.ascontiguousarray(
        labels[None] if single else labels, dtype=np.int32
    )
    b, h, w = arr.shape
    out = np.empty_like(arr)
    rc = lib.favit_enforce_connectivity(
        arr.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        b, h, w, int(min_size), int(max_labels), int(n_threads),
    )
    if rc != 0:
        raise RuntimeError(f"favit_enforce_connectivity failed (rc={rc})")
    return out[0] if single else out
