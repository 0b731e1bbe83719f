"""ctypes bindings for the native C++ decode/resize loader (csrc/dataloader.cc).

The reference decodes with PIL in torch DataLoader workers
(``image_classification/vtab.py:36-37,88``); here the host input pipeline is
C++: libjpeg/libpng decode + PIL-compatible antialiased bicubic resize +
normalization on an internal thread pool, called once per batch through a C
ABI (no per-image Python overhead, no multiprocessing).

The shared library is built lazily with g++ on first use and cached next to
the source; anything failing (no compiler, no libjpeg) falls back to the PIL
path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import List, Optional

import numpy as np

from cara_tpu.data.vtab import IMAGENET_MEAN, IMAGENET_STD

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO_PATH = os.path.join(_CSRC, "libcara_loader.so")
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_ERR: Optional[str] = None


def _build_so() -> str:
    src = os.path.join(_CSRC, "dataloader.cc")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        src, "-o", _SO_PATH, "-ljpeg", "-lpng",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None or _LIB_ERR is not None:
            return _LIB
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH)
                < os.path.getmtime(os.path.join(_CSRC, "dataloader.cc"))
            ):
                _build_so()
            lib = ctypes.CDLL(_SO_PATH)
            lib.cara_loader_create.restype = ctypes.c_void_p
            lib.cara_loader_create.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.cara_loader_destroy.argtypes = [ctypes.c_void_p]
            lib.cara_loader_decode_batch.restype = ctypes.c_int
            lib.cara_loader_decode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
            lib.cara_loader_decode_batch_u8.restype = ctypes.c_int
            lib.cara_loader_decode_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
            ]
            lib.cara_loader_decode_batch_rrc.restype = ctypes.c_int
            lib.cara_loader_decode_batch_rrc.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except Exception as exc:  # no compiler / libs -> PIL fallback
            _LIB_ERR = str(exc)
            print(f"[cara_tpu] native loader unavailable ({exc}); "
                  "falling back to PIL", file=sys.stderr)
    return _LIB


class NativeBatchDecoder:
    """Decode+resize+normalize a list of files into one NHWC float32 batch."""

    def __init__(self, image_size: int, num_threads: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
        self._lib = lib
        self.image_size = image_size
        mean = (ctypes.c_float * 3)(*IMAGENET_MEAN.tolist())
        std = (ctypes.c_float * 3)(*IMAGENET_STD.tolist())
        self._handle = lib.cara_loader_create(num_threads, image_size, mean, std)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.cara_loader_destroy(handle)
            self._handle = None

    def decode_batch(self, paths: List[str]) -> np.ndarray:
        n = len(paths)
        s = self.image_size
        out = np.empty((n, s, s, 3), np.float32)
        statuses = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        fails = self._lib.cara_loader_decode_batch(
            self._handle, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), statuses)
        if fails:
            bad = [paths[i] for i in range(n) if statuses[i]]
            raise IOError(f"failed to decode {fails} image(s), e.g. {bad[:3]}")
        return out

    def decode_batch_u8(self, paths: List[str]) -> np.ndarray:
        """Resized RGB uint8 (no normalization) — for host-side caches."""
        n = len(paths)
        s = self.image_size
        out = np.empty((n, s, s, 3), np.uint8)
        statuses = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        fails = self._lib.cara_loader_decode_batch_u8(
            self._handle, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), statuses)
        if fails:
            bad = [paths[i] for i in range(n) if statuses[i]]
            raise IOError(f"failed to decode {fails} image(s), e.g. {bad[:3]}")
        return out

    def decode_batch_rrc(self, paths: List[str],
                         seeds: np.ndarray) -> np.ndarray:
        """Train augmentation: random resized crop (torchvision parameters,
        crop sampled in C++ from splitmix64(seed) per image) + horizontal
        flip + normalize — the FGVC training transform without any
        per-image Python work."""
        n = len(paths)
        s = self.image_size
        seeds = np.ascontiguousarray(seeds, np.uint64)
        if seeds.shape != (n,):
            raise ValueError(f"need {n} seeds, got {seeds.shape}")
        out = np.empty((n, s, s, 3), np.float32)
        statuses = (ctypes.c_int * n)()
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        fails = self._lib.cara_loader_decode_batch_rrc(
            self._handle, arr, n,
            seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), statuses)
        if fails:
            bad = [paths[i] for i in range(n) if statuses[i]]
            raise IOError(f"failed to decode {fails} image(s), e.g. {bad[:3]}")
        return out

    def decode_one(self, path: str) -> np.ndarray:
        return self.decode_batch([path])[0]


def native_available() -> bool:
    return get_lib() is not None
