"""q8 activation-quantization parity mode (GHT_Q8_ACT).

Differential against direct numpy transliterations of the reference's
quantize_row_q8_0_ref / quantize_row_q8_K_ref (ggml-quants.c:194-244,
2479-2516), plus the qmatmul_xla toggle."""
import numpy as np
import pytest
import jax.numpy as jnp

from ggml_hexagon_tpu.ops.qmatmul import (q8_act_kind, qmatmul_xla,
                                          quantize_act_ref)
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant.pack import QCONFIGS


def ref_q8_0_np(x):
    """Transliteration of quantize_row_q8_0_ref + fp16 d dequant."""
    x = np.asarray(x, np.float32)
    out = np.zeros_like(x)
    for b in range(x.size // 32):
        blk = x[b * 32:(b + 1) * 32]
        amax = np.abs(blk).max()
        d = np.float32(amax / 127.0)
        iscale = np.float32(1.0 / d) if d else np.float32(0.0)
        q = np.array([np.round(v * iscale) for v in blk])  # roundf
        d16 = np.float32(np.float16(d))
        out[b * 32:(b + 1) * 32] = q * d16
    return out


def ref_q8_K_np(x):
    """Transliteration of quantize_row_q8_K_ref."""
    x = np.asarray(x, np.float32)
    out = np.zeros_like(x)
    for b in range(x.size // 256):
        blk = x[b * 256:(b + 1) * 256]
        amax, mx = 0.0, 0.0
        for v in blk:  # first-occurrence signed extreme, like the C scan
            if abs(v) > amax:
                amax, mx = abs(v), v
        if not amax:
            continue
        iscale = np.float32(-127.0 / mx)
        # nearest_int = round-half-to-even (ggml's magic-number trick)
        q = np.minimum(127, np.rint(blk * iscale))
        d = np.float32(1.0 / iscale)
        out[b * 256:(b + 1) * 256] = q * d
    return out


@pytest.mark.parametrize("K", [32, 256, 512])
def test_q8_0_matches_reference_transliteration(K):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, K)).astype(np.float32) * 3.0
    x[0, :5] = 0.0
    got = np.asarray(quantize_act_ref(jnp.asarray(x), "q8_0"))
    want = np.stack([ref_q8_0_np(r) for r in x])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


@pytest.mark.parametrize("K", [256, 512])
def test_q8_K_matches_reference_transliteration(K):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, K)).astype(np.float32) * 2.0
    x[1] = 0.0  # all-zero block path
    got = np.asarray(quantize_act_ref(jnp.asarray(x), "q8_K"))
    want = np.stack([ref_q8_K_np(r) for r in x])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_q8_K_half_ties_round_to_even():
    # values engineered so iscale*x lands exactly on .5 ties
    x = np.zeros(256, np.float32)
    x[0] = -127.0  # signed extreme -> iscale = 1.0
    x[1:6] = [0.5, 1.5, 2.5, -0.5, -1.5]
    got = np.asarray(quantize_act_ref(jnp.asarray(x[None]), "q8_K"))[0]
    # nearest_int(0.5)=0, (1.5)=2, (2.5)=2, (-0.5)=0, (-1.5)=-2
    np.testing.assert_allclose(got[1:6], [0.0, 2.0, 2.0, 0.0, -2.0])


def test_kind_table():
    assert q8_act_kind(QCONFIGS[GGMLType.Q4_0]) == "q8_0"
    assert q8_act_kind(QCONFIGS[GGMLType.Q4_1]) == "q8_1"
    assert q8_act_kind(QCONFIGS[GGMLType.Q8_0]) == "q8_0"
    assert q8_act_kind(QCONFIGS[GGMLType.Q4_K]) == "q8_K"
    assert q8_act_kind(QCONFIGS[GGMLType.Q6_K]) == "q8_K"
    assert q8_act_kind(QCONFIGS[GGMLType.IQ4_NL]) == "q8_0"
    assert q8_act_kind(QCONFIGS[GGMLType.IQ3_XXS]) == "q8_K"


def test_qmatmul_xla_toggle(monkeypatch):
    from ggml_hexagon_tpu.quant.pack import pack_tensor
    from ggml_hexagon_tpu.quant.ref_numpy import quantize

    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 256)).astype(np.float32)
    wq = quantize(w.reshape(-1), GGMLType.Q4_K)
    qt = pack_tensor(wq, GGMLType.Q4_K, (16, 256))
    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    monkeypatch.delenv("GHT_Q8_ACT", raising=False)
    y0 = np.asarray(qmatmul_xla(x, qt, compute_dtype=jnp.float32))
    # matches contracting the explicitly-quantized activations
    xq = quantize_act_ref(x, "q8_K")
    want = np.asarray(qmatmul_xla(xq, qt, compute_dtype=jnp.float32))
    monkeypatch.setenv("GHT_Q8_ACT", "1")
    y1 = np.asarray(qmatmul_xla(x, qt, compute_dtype=jnp.float32))
    monkeypatch.delenv("GHT_Q8_ACT", raising=False)
    # activation rounding changes the result a little, not a lot
    assert not np.array_equal(y0, y1)
    rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
    assert rel < 0.02, rel
    np.testing.assert_allclose(y1, want, rtol=1e-6, atol=1e-6)
