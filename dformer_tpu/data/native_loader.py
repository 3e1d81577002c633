"""ctypes bindings for the native C++ decode/batch loader
(dformer_tpu/native/loader.cpp). Builds the shared library on first use
(g++ is in the image); everything degrades gracefully to the pure-Python
loader when the toolchain or image libs are missing.

Usage:
    nl = NativeLoader(num_threads=4)
    batch = np.empty((B, H, W, 3), np.uint8)
    ticket = nl.submit([paths...], batch, want_color=True)   # async decode
    nl.wait(ticket)                                        # batch is filled
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libdfloader.so")
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_ERR: Optional[str] = None


def _build_so() -> Optional[str]:
    src = osp.join(_NATIVE_DIR, "loader.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", _SO_PATH, "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return None
    except Exception as e:  # toolchain/libs missing -> python fallback
        return f"native loader build failed: {e}"


def get_lib():
    """Load (building if needed) the native library, or None with a reason."""
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB, _LIB_ERR
    with _BUILD_LOCK:
        if _LIB is not None or _LIB_ERR is not None:
            return _LIB, _LIB_ERR
        if not osp.exists(_SO_PATH) or (
                osp.getmtime(_SO_PATH)
                < osp.getmtime(osp.join(_NATIVE_DIR, "loader.cpp"))):
            err = _build_so()
            if err:
                _LIB_ERR = err
                return None, _LIB_ERR
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _LIB_ERR = str(e)
            return None, _LIB_ERR
        lib.dfl_create.restype = ctypes.c_void_p
        lib.dfl_create.argtypes = [ctypes.c_int]
        lib.dfl_destroy.argtypes = [ctypes.c_void_p]
        lib.dfl_decode_image.restype = ctypes.c_int
        lib.dfl_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.dfl_submit_batch.restype = ctypes.c_long
        lib.dfl_submit_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        lib.dfl_wait_batch.restype = ctypes.c_int
        lib.dfl_wait_batch.argtypes = [ctypes.c_void_p, ctypes.c_long]
        _LIB = lib
        return _LIB, None


def available() -> bool:
    lib, _ = get_lib()
    return lib is not None


class NativeLoader:
    def __init__(self, num_threads: int = 4):
        lib, err = get_lib()
        if lib is None:
            raise RuntimeError(err)
        self._lib = lib
        self._h = lib.dfl_create(num_threads)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dfl_destroy(self._h)
            self._h = None

    def decode(self, path: str, want_color: bool = True) -> np.ndarray:
        """Synchronous single-image decode (native-sized)."""
        cap = 8192 * 8192 * 3
        buf = np.empty((cap,), np.uint8)
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        rc = self._lib.dfl_decode_image(
            path.encode(), int(want_color),
            buf.ctypes.data_as(ctypes.c_void_p), cap,
            ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
        if rc != 0:
            raise IOError(f"decode failed rc={rc}: {path}")
        return buf[:h.value * w.value * c.value].reshape(
            h.value, w.value, c.value).copy()

    def submit(self, paths: Sequence[str], out: np.ndarray,
               want_color: bool = True) -> int:
        """Async: decode len(paths) fixed-size images into out[i]."""
        assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
        n = len(paths)
        B, H, W = out.shape[0], out.shape[1], out.shape[2]
        C = out.shape[3] if out.ndim == 4 else 1
        assert n <= B
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        return self._lib.dfl_submit_batch(
            self._h, arr, n, int(want_color), H, W, C,
            out.ctypes.data_as(ctypes.c_void_p))

    def wait(self, ticket: int) -> None:
        rc = self._lib.dfl_wait_batch(self._h, ticket)
        if rc != 0:
            raise IOError(f"batch decode failed rc={rc}")
