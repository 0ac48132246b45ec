"""ctypes bridge to the native batch-assembly library, with automatic
build-on-first-use and a numpy fallback.

See native/slice_gather.cpp for the rationale (the reference's host
data path was its measured bottleneck).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmudiff_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MUDIFF_DISABLE_NATIVE") == "1":
        return None
    try:
        if not os.path.isfile(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "slice_gather.cpp")
            if not os.path.isfile(src):
                return None
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
                 src, "-o", _SO_PATH],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.mudiff_gather_normalize4.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.mudiff_gather_normalize4.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def gather_normalize4(
    sources: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    indices: np.ndarray,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Gather+normalize a batch from four (N, H, W) float32 stacks.

    Returns four (B, H, W, 1) float32 arrays in [-1, 1].  Uses the native
    library when available, numpy otherwise (bit-identical results).
    """
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    b = len(idx)
    h, w = sources[0].shape[1:3]
    hw = h * w
    lib = _load()
    usable = (
        lib is not None
        and all(
            isinstance(s, np.ndarray)
            and s.dtype == np.float32
            and s.flags.c_contiguous
            for s in sources
        )
    )
    if usable:
        outs = [np.empty((b, h, w, 1), np.float32) for _ in range(4)]
        lib.mudiff_gather_normalize4(
            sources[0].ctypes.data, sources[1].ctypes.data,
            sources[2].ctypes.data, sources[3].ctypes.data,
            idx.ctypes.data, b, hw,
            outs[0].ctypes.data, outs[1].ctypes.data,
            outs[2].ctypes.data, outs[3].ctypes.data,
            n_threads,
        )
        return tuple(outs)
    return tuple(
        (np.clip(s[idx].astype(np.float32), -3.0, 3.0) / 3.0)[..., None]
        for s in sources
    )
