"""Flash attention conformance vs the dense oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.ops.attention import (
    dense_attention,
    flash_attention_pallas,
    flash_attention_scan,
)


@pytest.fixture(scope="module")
def qkv(rng=None):
    r = np.random.default_rng(0)
    B, H, T, S, D = 2, 4, 16, 512, 64
    q = jnp.asarray(r.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.asarray(r.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(B, H, S, D)).astype(np.float32))
    # causal-ish mask with some fully-masked tail (like padded cache slots)
    t_idx = np.arange(T)[:, None]
    s_idx = np.arange(S)[None, :]
    mask = np.where(s_idx <= (S - T + t_idx) , 0.0, -1e30).astype(np.float32)
    mask[:, -64:] = -1e30  # trailing dead slots
    return q, k, v, jnp.asarray(mask)[None, None], 1.0 / np.sqrt(D)


def test_scan_matches_dense(qkv):
    q, k, v, mask, scale = qkv
    ref = dense_attention(q, k, v, mask, scale)
    out = flash_attention_scan(q, k, v, mask, scale, chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_scan_chunk_invariance(qkv):
    q, k, v, mask, scale = qkv
    a = flash_attention_scan(q, k, v, mask, scale, chunk=64)
    b = flash_attention_scan(q, k, v, mask, scale, chunk=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_pallas_matches_dense_interpret(qkv):
    q, k, v, mask, scale = qkv
    ref = dense_attention(q, k, v, mask, scale)
    out = flash_attention_pallas(q, k, v, mask, scale, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_model_flash_path_matches_dense():
    """forward() flash gate (S >= threshold) must match the dense path."""
    import ggml_hexagon_tpu.models.llama as L
    from ggml_hexagon_tpu.models.llama import LlamaConfig, forward, init_kv_cache
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.quant.pack import quantize_tensor

    cfg = LlamaConfig(n_vocab=128, n_embd=256, n_layer=1, n_head=4, n_head_kv=2, n_ff=512)
    r = np.random.default_rng(0)
    def qt(n, k):
        return quantize_tensor(r.normal(size=(n, k)).astype(np.float32) * 0.05,
                               GGMLType.Q8_0).astype_device()
    weights = {
        "tok_embd": jnp.asarray(r.normal(size=(128, 256)).astype(np.float32) * 0.05),
        "output_norm": jnp.ones(256), "output": qt(128, 256),
        "layers": [{
            "attn_norm": jnp.ones(256), "wq": qt(256, 256), "wk": qt(128, 256),
            "wv": qt(128, 256), "wo": qt(256, 256), "ffn_norm": jnp.ones(256),
            "ffn_gate": qt(512, 256), "ffn_up": qt(512, 256), "ffn_down": qt(256, 512)}],
    }
    ids = r.integers(0, 128, size=(1, 24)).astype(np.int32)
    old = L.FLASH_THRESHOLD
    try:
        L.FLASH_THRESHOLD = 10**9
        ref, _ = forward(cfg, weights, jnp.asarray(ids),
                         init_kv_cache(cfg, 1, 512, jnp.float32), 0,
                         logits_all=True, compute_dtype=jnp.float32)
        L.FLASH_THRESHOLD = 1
        out, _ = forward(cfg, weights, jnp.asarray(ids),
                         init_kv_cache(cfg, 1, 512, jnp.float32), 0,
                         logits_all=True, compute_dtype=jnp.float32)
    finally:
        L.FLASH_THRESHOLD = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_decode_attention_pallas_matches_dense():
    """Fused single-token GQA kernel vs the einsum/softmax_ext chain."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.ops.attention import decode_attention_pallas
    from ggml_hexagon_tpu.ops.basic import softmax_ext

    rng = np.random.default_rng(0)
    B, Hkv, G, S, D = 2, 4, 2, 256, 128
    qg = jnp.asarray(rng.normal(size=(B, Hkv, G, 1, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32))
    pos = np.array([37, 200], np.int32)
    scale = 1.0 / np.sqrt(D)
    for swa, cap in ((0, 0.0), (64, 0.0), (0, 30.0)):
        out = np.asarray(decode_attention_pallas(
            qg, k, v, jnp.asarray(pos), scale, swa=swa, logit_cap=cap,
            interpret=True))
        # dense reference: scores -> softmax_ext with causal(+swa) mask
        kt = np.asarray(k).transpose(0, 2, 1, 3)
        vt = np.asarray(v).transpose(0, 2, 1, 3)
        sc = np.einsum("bhgtd,bhsd->bhgts", np.asarray(qg), kt)
        idx = np.arange(S)[None, None, None, None, :]
        ok = idx <= pos[:, None, None, None, None]
        if swa:
            ok &= (pos[:, None, None, None, None] - idx) < swa
        mask = np.where(ok, 0.0, -np.inf)
        p = np.asarray(softmax_ext(jnp.asarray(sc), jnp.asarray(mask),
                                   scale=scale, logit_cap=cap))
        ref = np.einsum("bhgts,bhsd->bhgtd", p, vt)
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-5, (swa, cap, err)


def test_flash_cache_quantized_kv_matches_dequant_oracle():
    """flash_attention_cache consuming int8 K/V + per-slot scales must match
    dequantize-then-attend (VERDICT r1 item 4: the bf16 cache never
    materializes in HBM).  Also exercises the int4 cache flavor."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.ops.attention import flash_attention_cache

    rng = np.random.default_rng(11)
    B, Hkv, G, T, D, S = 1, 2, 2, 4, 64, 2048
    qg = jnp.asarray(rng.normal(size=(B, Hkv, G, T, D)).astype(np.float32))
    kf = rng.normal(size=(B, S, Hkv * D)).astype(np.float32)
    vf = rng.normal(size=(B, S, Hkv * D)).astype(np.float32)
    pos = jnp.asarray([S // 2], jnp.int32)

    for bits, it in ((8, np.int8), (4, None)):
        qmax = 127.0 if bits == 8 else 7.0
        d_k = np.abs(kf).max(axis=-1) / qmax
        d_v = np.abs(vf).max(axis=-1) / qmax
        kq = np.clip(np.round(kf / d_k[..., None]), -qmax, qmax)
        vq = np.clip(np.round(vf / d_v[..., None]), -qmax, qmax)
        if it is None:
            kqj = jnp.asarray(kq, jnp.int4)
            vqj = jnp.asarray(vq, jnp.int4)
        else:
            kqj = jnp.asarray(kq.astype(it))
            vqj = jnp.asarray(vq.astype(it))
        k4 = kqj.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        v4 = vqj.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        # oracle: dequantize, then the same flash path
        kd = (kq * d_k[..., None]).reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        vd = (vq * d_v[..., None]).reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
        want = np.asarray(flash_attention_cache(
            qg, jnp.asarray(kd), jnp.asarray(vd), pos, T, 0.125))
        got = np.asarray(flash_attention_cache(
            qg, k4, v4, pos, T, 0.125,
            k_scale=jnp.asarray(d_k), v_scale=jnp.asarray(d_v)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
