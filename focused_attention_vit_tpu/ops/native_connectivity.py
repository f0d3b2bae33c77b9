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
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "connectivity.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libfavit_connectivity.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
        _SRC
    ):
        return _LIB
    # Build to a per-pid temp path and os.replace (atomic) so a second
    # process never dlopens a half-written .so.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        logger.info("built native connectivity: %s", _LIB)
        return _LIB
    except Exception as e:  # no compiler / failed build → fallback
        logger.info("native connectivity unavailable (%s)", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.favit_enforce_connectivity.restype = ctypes.c_int
            lib.favit_enforce_connectivity.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
        except OSError as e:
            # Stale/foreign/corrupt .so must degrade to the documented
            # None fallback, not crash slic_segment(auto).
            logger.info("native connectivity dlopen failed (%s)", e)
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


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
