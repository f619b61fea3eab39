"""ctypes bindings to the native ingest runtime (native/ingest.cpp).

Auto-builds the shared library with the in-tree Makefile on first use and
falls back to numpy implementations when a C++ toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# TPU433_NATIVE_ASAN=1 swaps in the ASan+UBSan instrumented build (the
# caller must LD_PRELOAD libasan — tests/test_native_asan.py does)
_SO_NAME = ("libtpu433_ingest_asan.so"
            if os.environ.get("TPU433_NATIVE_ASAN")
            else "libtpu433_ingest.so")
_SO = os.path.join(_NATIVE_DIR, _SO_NAME)
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        # Always invoke make (no-op when fresh) so edits to ingest.cpp are
        # never shadowed by a stale binary.
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, _SO_NAME],
                           check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            if not os.path.exists(_SO):
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib = False
            return _lib
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.ring_free.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ring_pop.restype = ctypes.c_int
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.ring_fill.restype = ctypes.c_uint64
        lib.ring_fill.argtypes = [ctypes.c_void_p]
        lib.ring_dropped.restype = ctypes.c_uint64
        lib.ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return bool(_load())


def _buf(arr):
    return arr.ctypes.data_as(ctypes.c_char_p)


def cs8_to_cu8(src: np.ndarray) -> np.ndarray:
    """CS8 -> CU8 bias conversion (ref src/rtl_433.c:1829-1833)."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.int8)
    if not lib:
        return (src.astype(np.int16) + 128).astype(np.uint8)
    dst = np.empty(src.shape, dtype=np.uint8)
    lib.cs8_to_cu8(_buf(src.view(np.int8)), _buf(dst), src.size)
    return dst


def cf32_to_cs16(src: np.ndarray) -> np.ndarray:
    """CF32 -> CS16 clamp+scale (ref src/rtl_433.c:1812-1824)."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    if not lib:
        s = (src * 32767.0).astype(np.int64)
        return np.clip(s, -32767, 32767).astype(np.int16)
    dst = np.empty(src.shape, dtype=np.int16)
    lib.cf32_to_cs16(_buf(src), _buf(dst), src.size)
    return dst


def cu8_to_cs16(src: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if not lib:
        return ((src.astype(np.int16) - 128) << 8)
    dst = np.empty(src.shape, dtype=np.int16)
    lib.cu8_to_cs16(_buf(src), _buf(dst), src.size)
    return dst


def envelope_cu8(iq: np.ndarray) -> np.ndarray:
    """Host envelope reference (ref src/baseband.c:25-45)."""
    lib = _load()
    iq = np.ascontiguousarray(iq, dtype=np.uint8)
    n = iq.size // 2
    if not lib:
        d = 127 - iq.reshape(-1, 2).astype(np.int32)
        return (d[:, 0] ** 2 + d[:, 1] ** 2).astype(np.uint16)
    dst = np.empty(n, dtype=np.uint16)
    lib.envelope_cu8(_buf(iq), _buf(dst), n)
    return dst


def magnitude_est_cu8(iq: np.ndarray) -> np.ndarray:
    """Host magnitude-estimate reference (ref src/baseband.c:65-80)."""
    lib = _load()
    iq = np.ascontiguousarray(iq, dtype=np.uint8)
    n = iq.size // 2
    if not lib:
        a = np.abs(iq.reshape(-1, 2).astype(np.int32) - 128)
        mx = a.max(axis=1)
        mn = a.min(axis=1)
        return (122 * mx + 51 * mn).astype(np.uint16)
    dst = np.empty(n, dtype=np.uint16)
    lib.magnitude_est_cu8(_buf(iq), _buf(dst), n)
    return dst


class BlockRing:
    """SPSC block ring buffer backed by the native library (falls back to a
    Python deque). The acquisition-side buffer of the live path
    (ref include/sdr.h:17-18: 15 async buffers)."""

    def __init__(self, block_size: int, n_blocks: int = 15):
        self.block_size = block_size
        self.n_blocks = n_blocks
        lib = _load()
        if lib:
            self._lib = lib
            self._ring = lib.ring_create(block_size, n_blocks)
            self._q = None
        else:
            from collections import deque
            self._lib = None
            self._ring = None
            self._q = deque(maxlen=n_blocks)
            self._dropped = 0

    def push(self, block: np.ndarray) -> bool:
        block = np.ascontiguousarray(block, dtype=np.uint8)
        assert block.nbytes == self.block_size
        if self._lib:
            return bool(self._lib.ring_push(self._ring, _buf(block)))
        if len(self._q) >= self.n_blocks:
            self._dropped += 1
            return False
        self._q.append(block.copy())
        return True

    def pop(self):
        if self._lib:
            out = np.empty(self.block_size, dtype=np.uint8)
            if self._lib.ring_pop(self._ring, _buf(out)):
                return out
            return None
        return self._q.popleft() if self._q else None

    @property
    def fill(self) -> int:
        if self._lib:
            return int(self._lib.ring_fill(self._ring))
        return len(self._q)

    @property
    def dropped(self) -> int:
        if self._lib:
            return int(self._lib.ring_dropped(self._ring))
        return self._dropped

    def __del__(self):
        if getattr(self, "_lib", None) and self._ring:
            self._lib.ring_free(self._ring)
            self._ring = None
