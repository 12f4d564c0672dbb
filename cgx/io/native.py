"""ctypes bindings for the native MatrixMarket parser.

The reference's L0 is native code (NIST mmio.c, vendored in both build
trees); cgx keeps that property with a C++ parser built on demand via
``make -C cgx/_native`` (g++). Pure-Python :mod:`cgx.io.mmio` is the
always-available fallback — :func:`mmread_auto` picks the native path
when the library is present and the file is large enough to matter.

Set ``CGX_NO_NATIVE=1`` to force the Python parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from cgx.io import mmio as _py

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcgxmmio.so")
_NATIVE_THRESHOLD_BYTES = 1 << 20  # prefer native above 1 MiB

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class _CgxMMData(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int32),
        ("n", ctypes.c_int32),
        ("nnz", ctypes.c_int64),
        ("rows", ctypes.POINTER(ctypes.c_int32)),
        ("cols", ctypes.POINTER(ctypes.c_int32)),
        ("values", ctypes.POINTER(ctypes.c_double)),
        ("is_sparse", ctypes.c_int32),
        ("is_symmetric", ctypes.c_int32),
        ("is_skew", ctypes.c_int32),
        ("is_pattern", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
    ]


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_failed
    if os.environ.get("CGX_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.cgx_mm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(_CgxMMData)]
        lib.cgx_mm_read.restype = ctypes.c_int
        lib.cgx_mm_free.argtypes = [ctypes.POINTER(_CgxMMData)]
        lib.cgx_mm_free.restype = None
        lib.cgx_mm_write.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_char_p,
        ]
        lib.cgx_mm_write.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def mmread_native(path) -> _py.MMData:
    """Read a MatrixMarket file through the C++ parser."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native mmio library unavailable")
    data = _CgxMMData()
    rc = lib.cgx_mm_read(os.fspath(path).encode(), ctypes.byref(data))
    if rc != 0:
        msg = data.error.decode(errors="replace") or f"error {rc}"
        raise _py.MMIOError(f"{msg} ({path})")
    try:
        sym = (
            "symmetric"
            if data.is_symmetric
            else ("skew-symmetric" if data.is_skew else "general")
        )
        if data.is_sparse:
            tc = _py.Typecode(
                "matrix",
                "coordinate",
                "pattern" if data.is_pattern else "real",
                sym,
            )
            nnz = int(data.nnz)
            rows = np.ctypeslib.as_array(data.rows, shape=(nnz,)).copy() if nnz else np.empty(0, np.int32)
            cols = np.ctypeslib.as_array(data.cols, shape=(nnz,)).copy() if nnz else np.empty(0, np.int32)
            vals = np.ctypeslib.as_array(data.values, shape=(nnz,)).copy() if nnz else np.empty(0, np.float64)
            return _py.MMData(
                tc, (int(data.m), int(data.n)), nnz, rows=rows, cols=cols, values=vals
            )
        tc = _py.Typecode("matrix", "array", "real", sym)
        m, n = int(data.m), int(data.n)
        flat = np.ctypeslib.as_array(data.values, shape=(m * n,)).copy()
        return _py.MMData(tc, (m, n), m * n, dense=flat.reshape(n, m).T)
    finally:
        lib.cgx_mm_free(ctypes.byref(data))


def mmwrite_native(path, shape, rows, cols, values, symmetric=False, comment=""):
    lib = _load()
    if lib is None:
        raise RuntimeError("native mmio library unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float64)
    rc = lib.cgx_mm_write(
        os.fspath(path).encode(),
        shape[0],
        shape[1],
        len(values),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        1 if symmetric else 0,
        comment.encode(),
    )
    if rc != 0:
        raise _py.MMIOError(f"native writer failed with code {rc}")


def mmread_auto(path) -> _py.MMData:
    """Native parser for large files when available, Python otherwise."""
    try:
        size = os.path.getsize(path)
    except OSError:
        size = 0
    if size >= _NATIVE_THRESHOLD_BYTES and native_available():
        return mmread_native(path)
    return _py.mmread(path)
