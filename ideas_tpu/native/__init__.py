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
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        i64, u64, f64 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_double
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.ideas_preprocess_batch.argtypes = [u8p, f32p, i64, i64, i64, i64, u8p]
        lib.ideas_message_to_tensor.argtypes = [f32p, f32p, i64, i64, i64, f64, u64]
        lib.ideas_tensor_to_message.argtypes = [f32p, f32p, i64, i64, i64]
        lib.ideas_native_abi_version.restype = ctypes.c_int
        assert lib.ideas_native_abi_version() == 1
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
