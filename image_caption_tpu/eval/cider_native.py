"""ctypes binding for the native CIDEr-D scorer (native/cider.cpp).

Same semantics and API shape as ``eval.cider.CiderDFast``; used by the SCST
reward path when the shared library is available (built on demand with g++),
falling back to the pure-Python scorer otherwise.  Equivalence is tested in
tests/test_cider_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcider.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "cider.cpp")

_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and os.path.exists(_SRC_PATH):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.cider_init.restype = ctypes.c_void_p
    lib.cider_init.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.cider_score.restype = None
    lib.cider_score.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    lib.cider_free.restype = None
    lib.cider_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _flatten(seqs: Sequence[Sequence[int]]):
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.empty(int(offsets[-1]), dtype=np.int32)
    for i, s in enumerate(seqs):
        flat[offsets[i] : offsets[i + 1]] = np.asarray(s, dtype=np.int32)
    return flat, offsets


class CiderDNative:
    """Drop-in for CiderDFast backed by native/cider.cpp."""

    def __init__(self, refs: List[List[Sequence[int]]]):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libcider.so unavailable (g++ build failed?)")
        self._lib = lib
        self.num_images = len(refs)
        all_refs = [r for image_refs in refs for r in image_refs]
        refs_flat, ref_offsets = _flatten(all_refs)
        image_ref_offsets = np.zeros(len(refs) + 1, dtype=np.int64)
        for i, image_refs in enumerate(refs):
            image_ref_offsets[i + 1] = image_ref_offsets[i] + len(image_refs)
        # keep buffers alive for the duration of init
        self._handle = lib.cider_init(
            refs_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ref_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            image_ref_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(self.num_images),
        )

    def score(self, hyps: List[Sequence[int]]) -> np.ndarray:
        assert len(hyps) == self.num_images
        flat, offsets = _flatten(hyps)
        out = np.zeros(self.num_images, dtype=np.float64)
        self._lib.cider_score(
            ctypes.c_void_p(self._handle),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(self.num_images),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.cider_free(ctypes.c_void_p(self._handle))
            self._handle = None


def make_fast_cider(refs: List[List[Sequence[int]]]):
    """Native scorer when available, Python CiderDFast otherwise."""
    if native_available():
        try:
            return CiderDNative(refs)
        except Exception:
            pass
    from image_caption_tpu.eval.cider import CiderDFast

    return CiderDFast(refs)
