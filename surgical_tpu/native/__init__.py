"""ctypes bindings for the native data loader (loader.cpp).

Builds ``libsvloader.so`` on first use (g++ is in the image; no pip deps).
``decode_resize_batch`` is the fast path behind data/datasets.py; callers
fall back to PIL automatically when the toolchain or libjpeg is missing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libsvloader.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    cmd = ["g++", "-O3", "-fPIC", "-shared", src, "-o", _SO_PATH, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native loader build failed: %s", getattr(e, "stderr", e))
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            logger.warning("native loader load failed: %s", e)
            _build_failed = True
            return None
        lib.sv_decode_resize_batch.restype = ctypes.c_int
        lib.sv_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.sv_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_batch(
    paths: list[str],
    out_size: int,
    channels: int = 3,
    out: np.ndarray | None = None,
    n_threads: int = 0,
) -> tuple[np.ndarray, int]:
    """Decode + resize a batch of JPEGs into [N, out_size, out_size, channels]
    uint8. Returns (array, n_failures); failed slots are zero-filled
    (matching the zero-fallback convention of the flow loader)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_size, out_size, channels), dtype=np.uint8)
    assert out.shape == (n, out_size, out_size, channels) and out.dtype == np.uint8
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.sv_decode_resize_batch(
        c_paths,
        n,
        out_size,
        channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads,
    )
    return out, failures
