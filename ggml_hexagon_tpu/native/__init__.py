"""Native (C++) acceleration — ctypes bindings with NumPy fallback.

The runtime around the TPU compute path keeps native components where the
reference does (SURVEY §2: the quantize driver's thread fan-out,
llama-quant.cpp:412): `quantize.cpp` implements the encoder hot loops in
C++17 with a work-stealing thread pool.  Semantics are bit-identical to
quant/ref_numpy.py (differentially tested); if the shared library is absent
or the type unsupported, callers fall back to NumPy transparently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libggtpu_native.so")
_SRC = os.path.join(os.path.dirname(__file__), "quantize.cpp")

NATIVE_QTYPES = {2, 8, 12, 14}  # Q4_0, Q8_0, Q4_K, Q6_K


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3)."""
    if os.path.exists(_LIB_PATH) and not force and (
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        try:
            build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ggtpu_quantize.restype = ctypes.c_int
        lib.ggtpu_quantize.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _LIB = lib
        return lib
    except OSError:
        return None


def available() -> bool:
    return load() is not None


def quantize_native(
    x: np.ndarray, qtype: int, quant_weights: np.ndarray | None = None,
    n_threads: int = 0,
) -> np.ndarray | None:
    """Native quantize; returns None when unsupported (caller falls back)."""
    if int(qtype) not in NATIVE_QTYPES:
        return None
    lib = load()
    if lib is None:
        return None
    from ..quant.formats import GGMLType, row_size

    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    out = np.empty(row_size(GGMLType(int(qtype)), x.size), dtype=np.uint8)
    qw = None
    if quant_weights is not None:
        qw = np.ascontiguousarray(quant_weights, np.float32).reshape(-1)
        assert qw.size == x.size, "quant_weights must match element count"
    if n_threads <= 0:
        n_threads = os.cpu_count() or 4
    rc = lib.ggtpu_quantize(
        int(qtype),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        x.size,
        qw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if qw is not None else None,
        n_threads,
    )
    if rc != 0:
        return None
    return out
