"""Numerics of the decode-path fusion transforms (ADVICE r1 #3):

1. permute_rope_neox: a "norm"-rope model permuted to NEOX pairing must
   produce (near-)identical logits — the permutation plus the different
   rope pairing is mathematically the same function.
2. The fused decode-attention path (FUSED_ATTN_INTERPRET) must match the
   unfused XLA decode path on the same weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_hexagon_tpu.models import llama
from ggml_hexagon_tpu.models.fuse import permute_rope_neox
from ggml_hexagon_tpu.models.llama import (LlamaConfig, forward,
                                           init_kv_cache)


def _tiny(rope_mode="norm", seed=0, nh=2, nkv=1, hd=128, n_layer=2,
          n_vocab=96, n_ff=64):
    rng = np.random.default_rng(seed)
    cfg = LlamaConfig(
        n_vocab=n_vocab, n_embd=nh * hd, n_layer=n_layer, n_head=nh,
        n_head_kv=nkv, n_ff=n_ff, rope_mode=rope_mode, head_dim=hd)
    d = cfg.n_embd

    def w(n, k):
        return jnp.asarray(rng.normal(size=(n, k)) * 0.05, jnp.float32)

    layers = []
    for _ in range(n_layer):
        layers.append({
            "attn_norm": jnp.ones(d, jnp.float32),
            "wq": w(nh * hd, d), "wk": w(nkv * hd, d), "wv": w(nkv * hd, d),
            "wo": w(d, nh * hd),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "ffn_gate": w(n_ff, d), "ffn_up": w(n_ff, d),
            "ffn_down": w(d, n_ff),
        })
    weights = {
        "tok_embd": w(n_vocab, d),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": w(n_vocab, d),
        "layers": layers,
    }
    return cfg, weights


def test_permute_rope_neox_preserves_logits():
    cfg, weights = _tiny("norm")
    pweights, pcfg = permute_rope_neox(weights, cfg)
    assert pcfg.rope_mode == "neox"
    toks = jnp.asarray([[3, 17, 40, 9]], jnp.int32)
    kv0 = init_kv_cache(cfg, 1, 16)
    l0, _ = forward(cfg, weights, toks, kv0, jnp.int32(0), logits_all=True)
    kv1 = init_kv_cache(pcfg, 1, 16)
    l1, _ = forward(pcfg, pweights, toks, kv1, jnp.int32(0), logits_all=True)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=0, atol=2e-2)


def test_permute_is_noop_for_neox_models():
    cfg, weights = _tiny("neox")
    w2, cfg2 = permute_rope_neox(weights, cfg)
    assert cfg2 is cfg and w2 is weights


def test_fused_decode_path_matches_xla_path():
    cfg, weights = _tiny("neox", seed=1)
    toks = jnp.asarray([[5, 30, 61]], jnp.int32)
    step = jnp.asarray([[7]], jnp.int32)

    def run(fused):
        llama.FUSED_ATTN_INTERPRET = fused
        try:
            kv = init_kv_cache(cfg, 1, 16)
            _, kv = forward(cfg, weights, toks, kv, jnp.int32(0))
            logits, kv = forward(cfg, weights, step, kv, jnp.int32(3))
        finally:
            llama.FUSED_ATTN_INTERPRET = False
        return np.asarray(logits), {k: np.asarray(v, np.float32)
                                    for k, v in kv.items()}

    ref_logits, ref_kv = run(False)
    got_logits, got_kv = run(True)
    np.testing.assert_allclose(got_logits, ref_logits, rtol=0, atol=2e-2)
    for key in ref_kv:
        np.testing.assert_allclose(got_kv[key], ref_kv[key], rtol=0,
                                   atol=2e-2)


def test_fused_decode_path_q8_kv_cache():
    """q8_0 KV cache: the fused kernel dequantizes int8+scales in-kernel;
    must match the unfused path (which dequantizes the whole cache)."""
    cfg, weights = _tiny("neox", seed=3)
    toks = jnp.asarray([[5, 30, 61]], jnp.int32)
    step = jnp.asarray([[7]], jnp.int32)

    def run(fused):
        llama.FUSED_ATTN_INTERPRET = fused
        try:
            kv = init_kv_cache(cfg, 1, 16, "q8_0")
            _, kv = forward(cfg, weights, toks, kv, jnp.int32(0))
            logits, kv = forward(cfg, weights, step, kv, jnp.int32(3))
        finally:
            llama.FUSED_ATTN_INTERPRET = False
        return np.asarray(logits), {k: np.asarray(v, np.float32)
                                    for k, v in kv.items()}

    ref_logits, ref_kv = run(False)
    got_logits, got_kv = run(True)
    np.testing.assert_allclose(got_logits, ref_logits, rtol=0, atol=5e-2)
    for val, sc in (("k", "k_d"), ("v", "v_d")):
        # compare DEQUANTIZED caches: f32-vs-kernel rope rounding can flip
        # an int8 step at the boundary (one step == one scale unit)
        got = got_kv[val] * got_kv[sc][..., None]
        ref = ref_kv[val] * ref_kv[sc][..., None]
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-2)


def test_fused_decode_path_norm_model_end_to_end():
    """'norm' model permuted at load, decoded via the fused path: must
    match the unpermuted unfused decode."""
    cfg, weights = _tiny("norm", seed=2)
    pweights, pcfg = permute_rope_neox(weights, cfg)
    toks = jnp.asarray([[5, 30, 61]], jnp.int32)
    step = jnp.asarray([[7]], jnp.int32)

    kv = init_kv_cache(cfg, 1, 16)
    _, kv = forward(cfg, weights, toks, kv, jnp.int32(0))
    ref, _ = forward(cfg, weights, step, kv, jnp.int32(3))

    llama.FUSED_ATTN_INTERPRET = True
    try:
        kv = init_kv_cache(pcfg, 1, 16)
        _, kv = forward(pcfg, pweights, toks, kv, jnp.int32(0))
        got, _ = forward(pcfg, pweights, step, kv, jnp.int32(3))
    finally:
        llama.FUSED_ATTN_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0,
                               atol=2e-2)


def _tiny_quant(seed=0, nh=4, nkv=2, hd=128, n_layer=2, n_vocab=96,
                n_ff=512, qtype=None):
    """Tiny model with REAL Q4_K/Q6_K tensors large enough for fast planes
    (K multiples of 256) — exercises the fused epilogue decode path."""
    from ggml_hexagon_tpu.quant import pack as P
    from ggml_hexagon_tpu.quant.formats import GGMLType

    rng = np.random.default_rng(seed)
    cfg = LlamaConfig(
        n_vocab=n_vocab, n_embd=nh * hd, n_layer=n_layer, n_head=nh,
        n_head_kv=nkv, n_ff=n_ff, rope_mode="neox", head_dim=hd)
    d = cfg.n_embd

    def q(n, k, t=GGMLType.Q4_K):
        w = rng.normal(size=(n, k)).astype(np.float32) * 0.05
        return P.quantize_tensor(w, t).astype_device(fast=True)

    def w(n, k):
        return jnp.asarray(rng.normal(size=(n, k)) * 0.05, jnp.float32)

    layers = []
    for il in range(n_layer):
        layers.append({
            "attn_norm": jnp.asarray(rng.random(d) + 0.5, jnp.float32),
            "wq": q(nh * hd, d), "wk": q(nkv * hd, d),
            # layer 1 gets a mixed-type V (the Q4_K_M policy shape)
            "wv": q(nkv * hd, d, GGMLType.Q6_K if il else GGMLType.Q4_K),
            "wo": q(d, nh * hd),
            "ffn_norm": jnp.asarray(rng.random(d) + 0.5, jnp.float32),
            "ffn_gate": q(n_ff, d), "ffn_up": q(n_ff, d),
            "ffn_down": q(d, n_ff, GGMLType.Q6_K if il else GGMLType.Q4_K),
        })
    weights = {
        "tok_embd": w(n_vocab, d),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": w(n_vocab, d),
        "layers": layers,
    }
    return cfg, weights


def test_fused_epilogue_decode_matches_unfused():
    """The full fuse pipeline (wqkv/wqk concat + norm planes + gateup row
    interleave + in-kernel act/residual epilogues) must match the unfused
    forward within kernel-numerics tolerance on both prefill and decode."""
    from ggml_hexagon_tpu.models.fuse import fuse_weights

    cfg, weights = _tiny_quant(seed=2)
    fused = fuse_weights(weights, cfg)
    assert "w_gateup_il" in fused["layers"][0]
    assert "wqkv" in fused["layers"][0]          # layer 0: all Q4_K
    assert "wqk" in fused["layers"][1]           # layer 1: mixed-type V
    toks = jnp.asarray([[5, 30, 61]], jnp.int32)
    step = jnp.asarray([[7]], jnp.int32)

    def run(w, epilogue):
        llama.FUSED_EPILOGUE_INTERPRET = epilogue
        try:
            kv = init_kv_cache(cfg, 1, 16)
            lp, kv = forward(cfg, w, toks, kv, jnp.int32(0))
            ld, kv = forward(cfg, w, step, kv, jnp.int32(3))
        finally:
            llama.FUSED_EPILOGUE_INTERPRET = False
        return np.asarray(lp), np.asarray(ld)

    lp0, ld0 = run(weights, False)
    lp1, ld1 = run(fused, True)
    # in-kernel bf16 rms/act vs the f32 XLA path: measured maxabs ~0.05 on
    # logits of magnitude ~3 (kernel-numerics tolerance, not a logic bound)
    np.testing.assert_allclose(lp1, lp0, rtol=0, atol=1e-1)
    np.testing.assert_allclose(ld1, ld0, rtol=0, atol=1e-1)


def test_gateup_il_prefill_path_matches():
    """The un-interleave prefill branch of the row-permuted gate_up output
    must be exact vs the plain w_gateup forward (same quantized planes)."""
    from ggml_hexagon_tpu.models import fuse as F

    cfg, weights = _tiny_quant(seed=3)
    out = F.fuse_weights(weights, cfg)            # with gateup_il
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    kv0 = init_kv_cache(cfg, 1, 16)
    l0, _ = forward(cfg, weights, toks, kv0, jnp.int32(0), logits_all=True)
    kv1 = init_kv_cache(cfg, 1, 16)
    l1, _ = forward(cfg, out, toks, kv1, jnp.int32(0), logits_all=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=0, atol=1e-1)
