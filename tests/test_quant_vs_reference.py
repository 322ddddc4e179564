"""Differential tests: our (de)quantizers vs the reference's gguf-py oracle.

The reference ships a NumPy implementation of the GGUF block formats
(/root/reference/gguf-py/gguf/quants.py).  We use it purely as a black-box
oracle: bytes we produce must decode identically under their decoder, and
bytes they produce must decode identically under ours.  Skipped when the
reference checkout is absent.
"""
import numpy as np
import pytest

from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant import ref_numpy as R

ALL_TYPES = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"]
# gguf-py implements encoders only for the simple formats
ENCODER_TYPES = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return rng.normal(size=(8, 2 * 256 * 4)).astype(np.float32)


@pytest.mark.parametrize("tname", ALL_TYPES)
def test_our_bytes_decode_identically(reference_gguf_py, data, tname):
    from gguf.quants import dequantize as g_deq
    from gguf.constants import GGMLQuantizationType as GT

    mt = GGMLType[tname]
    buf = R.quantize(data.reshape(-1), mt)
    mine = R.dequantize(buf, mt, data.size)
    theirs = g_deq(buf.reshape(data.shape[0], -1), GT[tname]).reshape(-1)
    np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("tname", ENCODER_TYPES)
def test_encoders_byte_identical(reference_gguf_py, data, tname):
    from gguf.quants import quantize as g_q

    mt = GGMLType[tname]
    from gguf.constants import GGMLQuantizationType as GT

    theirs = g_q(data, GT[tname]).reshape(-1)
    mine = R.quantize(data.reshape(-1), mt)
    np.testing.assert_array_equal(mine, theirs)


@pytest.mark.parametrize("tname", ENCODER_TYPES)
def test_their_bytes_decode_identically(reference_gguf_py, data, tname):
    from gguf.quants import quantize as g_q, dequantize as g_deq
    from gguf.constants import GGMLQuantizationType as GT

    mt = GGMLType[tname]
    gbuf = g_q(data, GT[tname])
    mine = R.dequantize(gbuf.reshape(-1), mt, data.size)
    theirs = g_deq(gbuf, GT[tname]).reshape(-1)
    np.testing.assert_array_equal(mine, theirs)
