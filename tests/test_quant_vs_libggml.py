"""Byte-parity of the IMATRIX-aware encoders against the reference's own
compiled libggml (ctypes, CPU build at /tmp/lcpp_build — tools/parity.py
builds it; skipped when absent).

These are the quantize_row_*_impl paths llama-quantize runs when an
imatrix is supplied (qkx3/qp machinery) — r5 closed them byte-for-byte.
NOTE: ggml_init() must run first or GGML_FP16_TO_FP32's lookup table is
all zeros and the reference's requantize step silently no-ops (this
masked the real behavior for half a round)."""
import ctypes
import os

import numpy as np
import pytest

LIB = "/tmp/lcpp_build/bin/libggml-base.so"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="reference CPU build not present")


@pytest.fixture(scope="module")
def ggml():
    lib = ctypes.CDLL(LIB)

    class P(ctypes.Structure):
        _fields_ = [("mem_size", ctypes.c_size_t),
                    ("mem_buffer", ctypes.c_void_p),
                    ("no_alloc", ctypes.c_bool)]

    lib.ggml_init.restype = ctypes.c_void_p
    lib.ggml_init.argtypes = [P]
    lib.ggml_init(P(16 * 1024 * 1024, None, False))
    return lib


CASES = [
    ("quantize_q2_K", "quantize_q2_K", 84, 256),
    ("quantize_q3_K", "quantize_q3_K", 110, 256),
    ("quantize_q4_K", "quantize_q4_K", 144, 256),
    ("quantize_q5_K", "quantize_q5_K", 176, 256),
    ("quantize_q6_K", "quantize_q6_K", 210, 256),
]


@pytest.mark.parametrize("csym,ours,ts,bs", CASES)
@pytest.mark.parametrize("use_qw", [False, True])
def test_kquant_byte_parity(ggml, csym, ours, ts, bs, use_qw):
    from ggml_hexagon_tpu.quant import ref_numpy as R

    fn = getattr(ggml, csym)
    fn.restype = ctypes.c_size_t
    fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
                   ctypes.c_int64, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_float)]
    rng = np.random.default_rng(hash((csym, use_qw)) % 1000)
    nrow, k = 24, 512
    x = rng.normal(size=(nrow, k)).astype(np.float32) * 0.02
    qwt = (np.tile(rng.random((k,)).astype(np.float32) + 0.05, nrow)
           if use_qw else None)
    out = np.zeros(nrow * (k // bs) * ts, np.uint8)
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.ctypes.data,
       nrow, k,
       qwt.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
       if use_qw else None)
    mine = getattr(R, ours)(x.reshape(-1), quant_weights=qwt)
    assert np.array_equal(out, mine), (
        f"{csym} qw={use_qw}: {int((out != mine).sum())}/{out.size} differ")


@pytest.mark.parametrize("csym,ts,bs", [
    ("quantize_iq4_nl", 18, 32),
    ("quantize_iq4_xs", 136, 256),
])
@pytest.mark.parametrize("use_qw", [False, True])
def test_iq4_byte_parity(ggml, csym, ts, bs, use_qw):
    from ggml_hexagon_tpu.quant import iquants as IQ

    fn = getattr(ggml, csym)
    fn.restype = ctypes.c_size_t
    fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
                   ctypes.c_int64, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_float)]
    rng = np.random.default_rng(7)
    nrow, k = 16, 512
    x = rng.normal(size=(nrow, k)).astype(np.float32) * 0.02
    qwt = (np.tile(rng.random((k,)).astype(np.float32) + 0.05, nrow)
           if use_qw else None)
    out = np.zeros(nrow * (k // bs) * ts, np.uint8)
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.ctypes.data,
       nrow, k,
       qwt.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
       if use_qw else None)
    mine = getattr(IQ, csym)(x.reshape(-1), quant_weights=qwt)
    assert np.array_equal(out, mine)


@pytest.mark.parametrize("csym,gtype,ts", [
    ("quantize_iq3_xxs", 18, 98),   # GGML_TYPE_IQ3_XXS
    ("quantize_iq3_s", 21, 110),    # GGML_TYPE_IQ3_S
    ("quantize_iq2_s", 22, 82),     # GGML_TYPE_IQ2_S
    ("quantize_iq2_xxs", 16, 66),   # GGML_TYPE_IQ2_XXS (imatrix only)
    ("quantize_iq2_xs", 17, 74),    # GGML_TYPE_IQ2_XS (imatrix only)
])
@pytest.mark.parametrize("use_qw", [False, True])
def test_iq3_byte_parity(ggml, csym, gtype, ts, use_qw):
    """quantize_row_iq3_{xxs,s}_impl (ggml-quants.c:3548/3776) — the
    codebook grid search with truncated neighbour lists; needs
    ggml_quantize_init to build kmap/kneighbors (iq3xs_init_impl)."""
    from ggml_hexagon_tpu.quant import iquants as IQ

    if csym in ("quantize_iq2_xxs", "quantize_iq2_xs") and not use_qw:
        pytest.skip("reference GGML_ASSERTs quant_weights (aborts)")

    ggml.ggml_quantize_init.argtypes = [ctypes.c_int]
    ggml.ggml_quantize_init(gtype)
    fn = getattr(ggml, csym)
    fn.restype = ctypes.c_size_t
    fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
                   ctypes.c_int64, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_float)]
    rng = np.random.default_rng(11)
    nrow, k = 16, 512
    x = rng.normal(size=(nrow, k)).astype(np.float32) * 0.02
    qwt = (np.tile(rng.random((k,)).astype(np.float32) + 0.05, nrow)
           if use_qw else None)
    out = np.zeros(nrow * (k // 256) * ts, np.uint8)
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.ctypes.data,
       nrow, k,
       qwt.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
       if use_qw else None)
    mine = getattr(IQ, csym)(x.reshape(-1), quant_weights=qwt)
    assert np.array_equal(out, mine), (
        f"{csym} qw={use_qw}: {int((out != mine).sum())}/{out.size} differ")
