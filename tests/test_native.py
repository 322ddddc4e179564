"""Native C++ quantizer tests — differential vs the NumPy oracle.

Contract mirrors the reference's reference-vs-SIMD bound
(test-quantize-fns.cpp:17): same quality, byte-identical for the simple
formats, tie-break-level divergence only for the K-quant scale searches."""
import numpy as np
import pytest

from ggml_hexagon_tpu import native
from ggml_hexagon_tpu.quant import ref_numpy as R
from ggml_hexagon_tpu.quant.formats import GGMLType

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def data():
    return np.random.default_rng(0).normal(size=256 * 512).astype(np.float32)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q8_0])
def test_simple_formats_byte_identical(qtype, data):
    a = native.quantize_native(data, int(qtype))
    b = R.quantize(data, qtype)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_kquants_equal_quality(qtype, data):
    a = native.quantize_native(data, int(qtype))
    b = R.quantize(data, qtype)
    da = R.dequantize(a, qtype, data.size)
    db = R.dequantize(b, qtype, data.size)
    ea = np.sqrt(np.mean((da - data) ** 2))
    eb = np.sqrt(np.mean((db - data) ** 2))
    assert abs(ea - eb) / eb < 0.005  # identical quality (tie-breaks only)
    # reference-vs-alternate contract: cross difference small
    assert np.sqrt(np.mean((da - db) ** 2)) / np.std(data) < 0.05


def test_imatrix_native(data):
    qw = np.abs(np.random.default_rng(1).normal(size=data.size)).astype(np.float32) + 0.1
    a = native.quantize_native(data, int(GGMLType.Q4_K), quant_weights=qw)
    assert a is not None
    da = R.dequantize(a, GGMLType.Q4_K, data.size)
    assert np.isfinite(da).all()


def test_unsupported_returns_none(data):
    assert native.quantize_native(data, int(GGMLType.Q5_K)) is None


def test_threading_deterministic(data):
    a1 = native.quantize_native(data, int(GGMLType.Q4_K), n_threads=1)
    a8 = native.quantize_native(data, int(GGMLType.Q4_K), n_threads=8)
    np.testing.assert_array_equal(a1, a8)
