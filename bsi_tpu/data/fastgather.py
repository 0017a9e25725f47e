"""ctypes bindings for the native fused gather+normalize kernel.

Compiles ``_native/fastgather.c`` on first use (cached next to the source);
falls back to the numpy path transparently when no C compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "_native" / "fastgather.c"
_LIB_PATH = _SRC.with_suffix(".so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["cc", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gather_normalize_u8.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, f32p]
        lib.gather_normalize_u8_flip.argtypes = [
            u8p, i64p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p,
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - compiler missing
        print(f"[fastgather] native path unavailable ({e}); using numpy", file=sys.stderr)
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def gather_normalize(
    src_u8: np.ndarray, idx: np.ndarray, flip: Optional[np.ndarray] = None
) -> np.ndarray:
    """Gather ``src_u8[idx]`` and normalize uint8 -> float32 in [-1, 1].

    ``flip`` (bool per index) horizontally flips images (NHWC). Uses the
    native kernel when available, numpy otherwise; results are identical.
    """
    assert src_u8.dtype == np.uint8 and src_u8.flags.c_contiguous
    idx = np.ascontiguousarray(idx, np.int64)
    lib = _load()
    if lib is None:
        batch = src_u8[idx].astype(np.float32) * (2.0 / 255.0) - 1.0
        if flip is not None:
            batch = np.where(flip[:, None, None, None], batch[:, :, ::-1, :], batch)
        return batch

    out = np.empty((len(idx),) + src_u8.shape[1:], np.float32)
    if flip is None:
        row_elems = int(np.prod(src_u8.shape[1:]))
        lib.gather_normalize_u8(
            _ptr(src_u8, ctypes.c_uint8), _ptr(idx, ctypes.c_int64),
            len(idx), row_elems, _ptr(out, ctypes.c_float),
        )
    else:
        h, w, c = src_u8.shape[1:]
        flip_u8 = np.ascontiguousarray(flip, np.uint8)
        lib.gather_normalize_u8_flip(
            _ptr(src_u8, ctypes.c_uint8), _ptr(idx, ctypes.c_int64),
            _ptr(flip_u8, ctypes.c_uint8), len(idx), h, w, c,
            _ptr(out, ctypes.c_float),
        )
    return out
