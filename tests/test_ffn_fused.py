"""Conformance: the whole-FFN megakernel (ops/ffn_fused.py — wo+residual,
RMSNorm, gate_up, act-mul, down+residual in ONE launch) against the
composition of the individually-tested ops."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.ops.ffn_fused import ffn_fused, supports_ffn_fused
from ggml_hexagon_tpu.ops.qmm_fast import (interleave_perm, qmatmul_fast,
                                           uninterleave_cols)
from ggml_hexagon_tpu.quant import pack as P
from ggml_hexagon_tpu.quant.formats import GGMLType

D, NFF = 4096, 512
EPS = 1e-5


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2) / np.mean(b * b))


@pytest.fixture(scope="module", params=[GGMLType.Q4_K, GGMLType.Q6_K])
def setup(request):
    t_dn = request.param
    rng = np.random.default_rng(2)
    wo = P.quantize_tensor(
        rng.normal(size=(D, D)).astype(np.float32) * 0.02, GGMLType.Q4_K)
    gu = P.quantize_tensor(
        rng.normal(size=(2 * NFF, D)).astype(np.float32) * 0.02,
        GGMLType.Q4_K)
    dn = P.quantize_tensor(
        rng.normal(size=(D, NFF)).astype(np.float32) * 0.02, t_dn)
    # layout contracts: gate_up rows into down's interleaved column order;
    # wo and down OUTPUT rows by interleave_perm(d)
    perm_dn_cols = interleave_perm(NFF, dn.cfg.gs)
    # the megakernel speaks the interleaved layout; Q4_K defaults to the
    # transposed qp8 planes, so force il here
    gu_il = gu.astype_device(layout="il").take_rows(
        np.concatenate([perm_dn_cols, NFF + perm_dn_cols]))
    perm_d = interleave_perm(D, 32)
    wo_p = wo.astype_device(layout="il").take_rows(perm_d)
    dn_p = dn.astype_device(layout="il").take_rows(perm_d)
    wn = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1.0, jnp.float32)
    wn_il = wn[np.asarray(perm_d)]
    attn = jnp.asarray(rng.normal(size=(1, D)) * 0.3, jnp.float32)
    h = jnp.asarray(rng.normal(size=(1, D)) * 0.5, jnp.float32)
    return wo, gu, dn, wo_p, gu_il, dn_p, wn, wn_il, attn, h


def _reference(wo, gu, dn, wn, attn, h):
    """Unfused composition in f32 via the proven fast-plane oracle."""
    wo_d = np.asarray(qmatmul_fast(jnp.eye(D, dtype=jnp.float32),
                                   wo.astype_device(), interpret=True)).T
    gu_d = np.asarray(qmatmul_fast(jnp.eye(D, dtype=jnp.float32),
                                   gu.astype_device(), interpret=True)).T
    dn_d = np.asarray(qmatmul_fast(jnp.eye(NFF, dtype=jnp.float32),
                                   dn.astype_device(), interpret=True)).T
    a = np.asarray(attn, np.float64)
    hh = np.asarray(h, np.float64)
    h2 = a @ wo_d.T + hh
    inv = 1.0 / np.sqrt((h2 ** 2).mean(axis=1, keepdims=True) + EPS)
    xb = h2 * inv * np.asarray(wn, np.float64)
    g2 = xb @ gu_d.T
    gate, up = g2[:, :NFF], g2[:, NFF:]
    silu = gate / (1.0 + np.exp(-gate)) * up
    return silu @ dn_d.T + h2


def test_ffn_fused_matches_composition(setup):
    wo, gu, dn, wo_p, gu_il, dn_p, wn, wn_il, attn, h = setup
    assert supports_ffn_fused(wo_p, gu_il, dn_p, D, NFF)
    got = np.asarray(ffn_fused(attn, h, wo_p, gu_il, dn_p, wn_il, EPS,
                               act="silu", out_dtype=jnp.float32,
                               interpret=True))
    want = _reference(wo, gu, dn, wn, attn, h)
    assert nmse(got, want) < 5e-4, nmse(got, want)


def test_ffn_fused_batch_pad(setup):
    wo, gu, dn, wo_p, gu_il, dn_p, wn, wn_il, attn, h = setup
    rng = np.random.default_rng(5)
    attn3 = jnp.asarray(rng.normal(size=(3, D)) * 0.3, jnp.float32)
    h3 = jnp.asarray(rng.normal(size=(3, D)) * 0.5, jnp.float32)
    got = np.asarray(ffn_fused(attn3, h3, wo_p, gu_il, dn_p, wn_il, EPS,
                               act="silu", out_dtype=jnp.float32,
                               interpret=True))
    want = _reference(wo, gu, dn, wn, attn3, h3)
    assert got.shape == (3, D)
    assert nmse(got, want) < 5e-4


def test_ffn_fused_model_integration(monkeypatch):
    """Opt-in integration: GHT_FFN_FUSED=1 routes decode through the
    megakernel; logits must match the split path (interpret mode)."""
    import ggml_hexagon_tpu.models.llama as L
    from ggml_hexagon_tpu.models.fuse import fuse_weights
    from ggml_hexagon_tpu.models.llama import (LlamaConfig, forward,
                                               init_kv_cache)

    rng = np.random.default_rng(7)
    d, nff = 4096, 512
    cfg = LlamaConfig(n_vocab=64, n_embd=d, n_layer=1, n_head=4,
                      n_head_kv=2, n_ff=nff, rope_mode="neox")

    def qt(n, k):
        return P.quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.02,
            GGMLType.Q4_K).astype_device(layout="il")

    hd = d // 4
    base = {
        "tok_embd": jnp.asarray(rng.normal(size=(64, d)) * 0.02,
                                jnp.float32),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(64, d),
        "layers": [{
            "attn_norm": jnp.ones(d, jnp.float32),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "wq": qt(4 * hd, d), "wk": qt(2 * hd, d), "wv": qt(2 * hd, d),
            "wo": qt(d, 4 * hd),
            "ffn_gate": qt(nff, d), "ffn_up": qt(nff, d),
            "ffn_down": qt(d, nff),
        }],
    }
    kv = init_kv_cache(cfg, 1, 16)
    tok = jnp.asarray([[5]], jnp.int32)
    old = L.FUSED_EPILOGUE_INTERPRET, L.FUSED_ATTN_INTERPRET
    try:
        L.FUSED_EPILOGUE_INTERPRET = L.FUSED_ATTN_INTERPRET = True
        monkeypatch.setenv("GHT_FFN_FUSED", "1")
        wf = fuse_weights({**base, "layers": [dict(base["layers"][0])]},
                          cfg)
        assert "ffp" in wf["layers"][0], "megakernel layout not attached"
        lf, _ = forward(cfg, wf, tok, kv, jnp.int32(0))
        monkeypatch.setenv("GHT_FFN_FUSED", "0")
        ws = fuse_weights({**base, "layers": [dict(base["layers"][0])]},
                          cfg)
        assert "ffp" not in ws["layers"][0]
        ls, _ = forward(cfg, ws, tok, kv, jnp.int32(0))
    finally:
        L.FUSED_EPILOGUE_INTERPRET, L.FUSED_ATTN_INTERPRET = old
    a = np.asarray(lf, np.float64)
    b = np.asarray(ls, np.float64)
    assert ((a - b) ** 2).sum() / (b ** 2).sum() < 5e-4
