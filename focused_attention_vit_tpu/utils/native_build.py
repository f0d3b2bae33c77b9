"""Shared build-and-load scaffolding for the C++ native kernels.

One definition of the compile-to-temp / atomic-``os.replace`` / dlopen-
with-fallback discipline used by every native module (the batch
prefetcher, the SLIC connectivity kernel) — previously each carried a
near-verbatim copy that had already drifted in log wording and error
handling (round-3 review finding).

Semantics:
* rebuild when the .so is missing or older than its source;
* build to a per-pid temp path and ``os.replace`` so a concurrent
  process never dlopens a half-written library;
* any failure (no compiler, failed build, stale/foreign .so) degrades to
  ``None`` — callers fall back to their documented pure-Python path;
* the result (including ``None``) is cached per process, thread-safely.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Callable, Optional

logger = logging.getLogger(__name__)

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_CXX_CMD = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]


class NativeLib:
    """Lazily built, process-cached ctypes binding for one .cpp kernel.

    ``configure`` receives the freshly dlopened ``ctypes.CDLL`` and sets
    restype/argtypes; if it raises, the library is treated as unavailable.
    """

    def __init__(self, src: str, lib: str, name: str,
                 configure: Callable[[ctypes.CDLL], None]):
        self._src = src
        self._lib_path = lib
        self._name = name
        self._configure = configure
        self._lock = threading.Lock()
        self._lib: Optional[ctypes.CDLL] = None
        self._tried = False

    def _build(self) -> Optional[str]:
        if os.path.exists(self._lib_path) and os.path.getmtime(
            self._lib_path
        ) >= os.path.getmtime(self._src):
            return self._lib_path
        tmp = f"{self._lib_path}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                _CXX_CMD + [self._src, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, self._lib_path)
            logger.info("built native %s: %s", self._name, self._lib_path)
            return self._lib_path
        except Exception as e:  # no compiler / failed build → fallback
            logger.info("native %s unavailable (%s)", self._name, e)
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None

    def get(self) -> Optional[ctypes.CDLL]:
        with self._lock:
            if self._tried:
                return self._lib
            self._tried = True
            if not os.path.exists(self._src):
                return None
            path = self._build()
            if path is None:
                return None
            try:
                lib = ctypes.CDLL(path)
                self._configure(lib)
            except Exception as e:  # stale/foreign .so → fallback
                logger.info("native %s dlopen failed (%s)", self._name, e)
                return None
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        return self.get() is not None
