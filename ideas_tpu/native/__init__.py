"""Native host runtime bindings (ctypes).

Builds `libideas_native.so` from core.cpp on first use (make + g++; both
baked into the image) and exposes:

  * preprocess_batch(uint8 NHWC, flips) -> float32 [-1, 1]
  * message_to_tensor / tensor_to_message — native codec (bit-exact with
    ideas_tpu.stego up to jitter RNG)

Everything degrades gracefully to the numpy path if the toolchain is
unavailable (`available()` returns False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libideas_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_HERE, "core.cpp")
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
        if stale and not _build():
            return None
        try:
            return _bind(ctypes.CDLL(_LIB_PATH))
        except Exception:
            # Stale-but-newer-mtime .so (copied tree, clock skew) or a
            # concurrent relink: rebuild once, then give up gracefully —
            # available() must return False, never raise.
            if not _build():
                return None
            try:
                return _bind(ctypes.CDLL(_LIB_PATH))
            except Exception:
                return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare signatures + ABI check; raises if the .so is old/broken
    (callers catch and rebuild/fall back)."""
    global _lib
    i64, u64, f64 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_double
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.ideas_preprocess_batch.argtypes = [u8p, f32p, i64, i64, i64, i64, u8p]
    lib.ideas_message_to_tensor.argtypes = [f32p, f32p, i64, i64, i64, f64, u64]
    lib.ideas_tensor_to_message.argtypes = [f32p, f32p, i64, i64, i64]
    vp = ctypes.c_void_p
    lib.ideas_lmdb_open.argtypes = [ctypes.c_char_p]
    lib.ideas_lmdb_open.restype = vp
    lib.ideas_lmdb_close.argtypes = [vp]
    lib.ideas_lmdb_entries.argtypes = [vp]
    lib.ideas_lmdb_entries.restype = i64
    lib.ideas_lmdb_get.argtypes = [vp, vp, i64, vp, i64]
    lib.ideas_lmdb_get.restype = i64
    lib.ideas_lmdb_dump_keys.argtypes = [vp, vp, i64, vp, i64]
    lib.ideas_lmdb_dump_keys.restype = i64
    lib.ideas_native_abi_version.restype = ctypes.c_int
    if lib.ideas_native_abi_version() < 2:
        raise RuntimeError("stale libideas_native.so (ABI < 2)")
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(imgs: np.ndarray, flips: np.ndarray) -> np.ndarray:
    """uint8 (N,H,W,C) + bool flips (N,) -> float32 [-1,1] with h-flips."""
    lib = _load()
    n, h, w, c = imgs.shape
    imgs = np.ascontiguousarray(imgs, np.uint8)
    flips = np.ascontiguousarray(flips.astype(np.uint8))
    out = np.empty((n, h, w, c), np.float32)
    lib.ideas_preprocess_batch(imgs, out, n, h, w, c, flips)
    return out


def message_to_tensor(msg: np.ndarray, sigma: int, delta: float,
                      seed: int = 0) -> np.ndarray:
    lib = _load()
    b, length = msg.shape
    msg = np.ascontiguousarray(msg, np.float32)
    out = np.empty((b, length // sigma), np.float32)
    lib.ideas_message_to_tensor(msg, out, b, length, sigma, float(delta),
                                seed & 0xFFFFFFFFFFFFFFFF)
    return out


def tensor_to_message(tensor: np.ndarray, sigma: int) -> np.ndarray:
    lib = _load()
    b, groups = tensor.shape
    tensor = np.ascontiguousarray(tensor, np.float32)
    out = np.empty((b, groups * sigma), np.float32)
    lib.ideas_tensor_to_message(tensor, out, b, groups, sigma)
    return out


class NativeLMDBReader:
    """Read-only LMDB access backed by the native runtime (the fast path
    for `ideas_tpu.data.lmdb_reader.LMDBReader` — same semantics, C++
    mmap + B+tree walk)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.ideas_lmdb_open(os.fsencode(path))
        if not self._h:
            raise ValueError(f"not an LMDB environment: {path}")
        self.entries = int(lib.ideas_lmdb_entries(self._h))

    def close(self):
        if self._h:
            self._lib.ideas_lmdb_close(self._h)
            self._h = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass

    def get(self, key: bytes) -> Optional[bytes]:
        kbuf = ctypes.create_string_buffer(key, len(key))
        size = self._lib.ideas_lmdb_get(
            self._h, ctypes.cast(kbuf, ctypes.c_void_p), len(key), None, 0)
        if size < 0:
            return None
        out = ctypes.create_string_buffer(size)
        got = self._lib.ideas_lmdb_get(
            self._h, ctypes.cast(kbuf, ctypes.c_void_p), len(key),
            ctypes.cast(out, ctypes.c_void_p), size)
        assert got == size
        return out.raw

    def keys(self):
        """All keys, in B+tree (sorted) order."""
        n = self.entries
        lens = np.zeros(max(n, 1), np.int32)
        total = self._lib.ideas_lmdb_dump_keys(
            self._h, None, 0, lens.ctypes.data_as(ctypes.c_void_p), n)
        buf = ctypes.create_string_buffer(int(total))
        self._lib.ideas_lmdb_dump_keys(
            self._h, ctypes.cast(buf, ctypes.c_void_p), total,
            None, 0)
        out, pos = [], 0
        raw = buf.raw
        for i in range(n):
            out.append(raw[pos:pos + int(lens[i])])
            pos += int(lens[i])
        return out
