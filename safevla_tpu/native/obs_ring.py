"""ctypes binding for the native shared-memory observation ring.

See native/obs_ring.cpp. The ring replaces pickle-over-pipe frame transport
between simulator worker processes and the rollout runner with single-copy
shared memory. Falls back gracefully (native_available() == False) when the
shared library hasn't been built; `build_native()` compiles it with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libsafevla_obs_ring.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_lib: Optional[ctypes.CDLL] = None


def _lib_path() -> str:
    return os.path.join(_NATIVE_DIR, _LIB_NAME)


def build_native(force: bool = False) -> str:
    """Compile the shared library (idempotent)."""
    path = _lib_path()
    src = os.path.join(_NATIVE_DIR, "obs_ring.cpp")
    if force or not os.path.exists(path) or os.path.getmtime(src) > os.path.getmtime(path):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return path


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if not os.path.exists(path):
        try:
            build_native()
        except Exception:
            return None
    lib = ctypes.CDLL(path)
    lib.obs_ring_open.restype = ctypes.c_void_p
    lib.obs_ring_open.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
    ]
    lib.obs_ring_push.restype = ctypes.c_int
    lib.obs_ring_push.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_int64,
    ]
    lib.obs_ring_peek.restype = ctypes.c_int64
    lib.obs_ring_peek.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
    ]
    lib.obs_ring_release.argtypes = [ctypes.c_void_p]
    lib.obs_ring_size.restype = ctypes.c_uint32
    lib.obs_ring_size.argtypes = [ctypes.c_void_p]
    lib.obs_ring_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        return _load() is not None
    except OSError:
        return False


class ObsRing:
    """One SPSC shared-memory ring (one per env stream)."""

    def __init__(self, name: str, n_slots: int, slot_bytes: int, create: bool):
        lib = _load()
        if lib is None:
            raise RuntimeError("native obs_ring library unavailable; run build_native()")
        self._lib = lib
        self._handle = lib.obs_ring_open(
            name.encode(), n_slots, slot_bytes, 1 if create else 0
        )
        if not self._handle:
            raise RuntimeError(f"obs_ring_open failed for {name}")
        self.name = name
        self.slot_bytes = slot_bytes

    def push(self, data: np.ndarray, tag: int = 0, timeout_s: float = 10.0) -> None:
        buf = np.ascontiguousarray(data).view(np.uint8).ravel()
        rc = self._lib.obs_ring_push(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.nbytes,
            tag,
            int(timeout_s * 1e6),
        )
        if rc == -2:
            raise ValueError(f"payload {buf.nbytes}B exceeds slot {self.slot_bytes}B")
        if rc != 0:
            raise TimeoutError(f"obs_ring push timed out on {self.name}")

    def pop(self, timeout_s: float = 10.0) -> Tuple[np.ndarray, int]:
        """Returns (copy of payload bytes, tag)."""
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        tag = ctypes.c_uint32()
        n = self._lib.obs_ring_peek(
            self._handle, ctypes.byref(ptr), ctypes.byref(tag), int(timeout_s * 1e6)
        )
        if n < 0:
            raise TimeoutError(f"obs_ring pop timed out on {self.name}")
        data = np.ctypeslib.as_array(ptr, shape=(int(n),)).copy()
        self._lib.obs_ring_release(self._handle)
        return data, tag.value

    def pop_into(self, out: np.ndarray, timeout_s: float = 10.0) -> int:
        """Zero-extra-copy variant: read the payload directly into `out`."""
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        tag = ctypes.c_uint32()
        n = self._lib.obs_ring_peek(
            self._handle, ctypes.byref(ptr), ctypes.byref(tag), int(timeout_s * 1e6)
        )
        if n < 0:
            raise TimeoutError(f"obs_ring pop timed out on {self.name}")
        flat = out.view(np.uint8).ravel()
        assert flat.nbytes >= n, "output buffer too small"
        src = np.ctypeslib.as_array(ptr, shape=(int(n),))
        flat[: int(n)] = src
        self._lib.obs_ring_release(self._handle)
        return tag.value

    def size(self) -> int:
        return self._lib.obs_ring_size(self._handle)

    def close(self):
        if self._handle:
            self._lib.obs_ring_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
