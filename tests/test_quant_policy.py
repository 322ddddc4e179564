"""QuantPolicy vs the reference's llama_tensor_get_type rules
(src/llama-quant.cpp:122-310) for the i-quant/imatrix ftypes added in
round 5, plus regression pins for the byte-parity-proven ftypes."""
import numpy as np
import pytest

from ggml_hexagon_tpu.quant.formats import GGMLType as T
from ggml_hexagon_tpu.quant.policy import FTYPES, QuantPolicy


def P(ft, **kw):
    return QuantPolicy(ft, n_layer=8, **kw)


def test_output_rules():
    assert P("IQ3_XXS").tensor_type("output.weight", (32000, 256)) == T.Q5_K
    assert P("IQ2_XXS").tensor_type("output.weight", (32000, 256)) == T.Q5_K
    assert P("Q2_K").tensor_type("output.weight", (32000, 256)) == T.Q6_K
    assert P("IQ4_XS").tensor_type("output.weight", (32000, 256)) == T.Q6_K
    assert P("Q8_0").tensor_type("output.weight", (32000, 256)) == T.Q8_0
    # tied embeddings: token_embd takes the output rule
    assert P("IQ3_XXS", has_output=False).tensor_type(
        "token_embd.weight", (32000, 256)) == T.Q5_K


def test_token_embd_rules():
    assert P("IQ3_XXS").tensor_type("token_embd.weight", (32000, 256)) == T.IQ3_S
    assert P("Q2_K").tensor_type("token_embd.weight", (32000, 256)) == T.Q2_K
    assert P("IQ4_XS").tensor_type("token_embd.weight", (32000, 256)) == T.IQ4_XS


@pytest.mark.parametrize("gqa,want", [(1, T.Q3_K), (4, T.Q4_K)])
def test_q2k_attn_v_gqa(gqa, want):
    assert P("Q2_K", n_gqa=gqa).tensor_type(
        "blk.0.attn_v.weight", (256, 256)) == want


def test_q2k_ffn_down_and_attn_output():
    p = P("Q2_K")
    assert p.tensor_type("blk.3.ffn_down.weight", (256, 512)) == T.Q3_K
    assert p.tensor_type("blk.3.attn_output.weight", (256, 256)) == T.Q3_K


def test_iq3xxs_rules_imatrix_switch():
    pi = P("IQ3_XXS", n_gqa=2, has_imatrix=True)
    pn = P("IQ3_XXS", n_gqa=2, has_imatrix=False)
    # attn_v: imatrix keeps IQ3_XXS, without it bumps to IQ3_S
    assert pi.tensor_type("blk.1.attn_v.weight", (256, 256)) == T.IQ3_XXS
    assert pn.tensor_type("blk.1.attn_v.weight", (256, 256)) == T.IQ3_S
    # attn_k / attn_q drop to IQ2_S
    assert pi.tensor_type("blk.1.attn_k.weight", (256, 256)) == T.IQ2_S
    assert pi.tensor_type("blk.1.attn_q.weight", (256, 256)) == T.IQ2_S
    # ffn_down: imatrix keeps base; without it Q4_K early / Q3_K later
    assert pi.tensor_type("blk.1.ffn_down.weight", (256, 512)) == T.IQ3_XXS
    assert pn.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.Q4_K
    assert pn.tensor_type("blk.4.ffn_down.weight", (256, 512)) == T.Q3_K
    # attn_output bumps to IQ3_S
    assert pi.tensor_type("blk.1.attn_output.weight", (256, 256)) == T.IQ3_S


def test_iq4xs_rules():
    pi = P("IQ4_XS", n_gqa=2, has_imatrix=True)
    pn = P("IQ4_XS", n_gqa=2, has_imatrix=False)
    assert pi.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.IQ4_XS
    assert pn.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.Q5_K
    assert P("IQ4_XS", n_gqa=4).tensor_type(
        "blk.0.attn_v.weight", (256, 256)) == T.Q5_K


def test_q4_0_imatrix_ffn_down_guard():
    pi = P("Q4_0", has_imatrix=True)
    pn = P("Q4_0", has_imatrix=False)
    assert pi.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.Q4_1
    assert pn.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.Q4_0
    assert pi.tensor_type("blk.4.ffn_down.weight", (256, 512)) == T.Q4_0


def test_proven_ftypes_unchanged():
    """Byte-parity-proven ftypes (PARITY.md) keep their r4 choices."""
    p = QuantPolicy("Q4_K_M", n_layer=32)
    assert p.tensor_type("blk.0.attn_v.weight", (256, 256)) == T.Q6_K
    assert p.tensor_type("blk.10.attn_v.weight", (256, 256)) == T.Q4_K
    assert p.tensor_type("blk.0.ffn_down.weight", (256, 512)) == T.Q6_K
    assert p.tensor_type("output.weight", (32000, 256)) == T.Q6_K
    assert p.tensor_type("blk.0.attn_norm.weight", (256,)) == T.F32
    for ft in ("Q8_0", "Q4_0", "Q6_K"):
        q = QuantPolicy(ft, n_layer=4)
        assert q.tensor_type("blk.1.ffn_up.weight", (512, 256)) == FTYPES[ft]


def test_blocksize_fallback_chain():
    # a 20-col tensor can't take 256-block types: IQ4_XS -> IQ4_NL -> F16
    p = P("IQ4_XS")
    assert p.tensor_type("blk.0.ffn_up.weight", (64, 20)) == T.F16
    assert p.tensor_type("blk.0.ffn_up.weight", (64, 160)) == T.IQ4_NL


def test_iq4_encoders_roundtrip():
    """New exact IQ4 encoders: self-consistent and within the reference
    RMSE budget, with and without imatrix weights."""
    from ggml_hexagon_tpu.quant.iquants import (dequantize_iq4_nl,
                                                dequantize_iq4_xs,
                                                quantize_iq4_nl,
                                                quantize_iq4_xs)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 512)).astype(np.float32) * 0.1
    qw = (rng.random(size=x.shape).astype(np.float32) + 0.1)
    for quant, deq in ((quantize_iq4_nl, dequantize_iq4_nl),
                       (quantize_iq4_xs, dequantize_iq4_xs)):
        for w in (None, qw):
            buf = quant(x.reshape(-1), quant_weights=(
                None if w is None else w.reshape(-1)))
            back = deq(buf, x.size)
            rmse = float(np.sqrt(np.mean((back - x.reshape(-1)) ** 2)))
            assert rmse < 0.002 * 5, rmse  # 4-bit budget at 0.1 sigma
