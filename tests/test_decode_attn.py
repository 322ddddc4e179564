"""Conformance: the fused decode attention (rope + cache attention,
ops/decode_attn.py) against the unfused oracle (rope + dense softmax
over cache slots <= pos, with the fresh row written by the caller)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_hexagon_tpu.ops.basic import RopeParams, rope_freqs
from ggml_hexagon_tpu.ops.decode_attn import fused_decode_attention


def _rot(x, pos_b, inv_freq, n_dims, mscale):
    half = n_dims // 2
    ang = pos_b.astype(jnp.float32)[:, None] * jnp.asarray(inv_freq)[None]
    cos = jnp.cos(ang)[:, None, :] * mscale
    sin = jnp.sin(ang)[:, None, :] * mscale
    x1, x2 = x[..., :half], x[..., half:n_dims]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    if n_dims < x.shape[-1]:
        out = jnp.concatenate([out, x[..., n_dims:]], axis=-1)
    return out


def _oracle(qkv, k_cache, v_cache, pos_b, inv_freq, Hq, Hkv, D, scale,
            swa=0, logit_cap=0.0, mscale=1.0, n_dims=0):
    """Dense reference over flat caches [B, S, Hkv*D]."""
    B = qkv.shape[0]
    S = k_cache.shape[1]
    G = Hq // Hkv
    n_dims = n_dims or D
    q = qkv[:, : Hq * D].reshape(B, Hq, D).astype(jnp.float32)
    k = qkv[:, Hq * D : (Hq + Hkv) * D].reshape(B, Hkv, D).astype(jnp.float32)
    v = qkv[:, (Hq + Hkv) * D :].reshape(B, Hkv, D).astype(jnp.float32)
    if inv_freq is not None:
        q = _rot(q, pos_b, inv_freq, n_dims, mscale)
        k = _rot(k, pos_b, inv_freq, n_dims, mscale)
    kc = k_cache.astype(jnp.float32).reshape(B, S, Hkv, D)
    vc = v_cache.astype(jnp.float32).reshape(B, S, Hkv, D)
    rows = jnp.arange(B)
    kc = kc.at[rows, pos_b].set(k)
    vc = vc.at[rows, pos_b].set(v)
    qg = q.reshape(B, Hkv, G, D)
    s = jnp.einsum("bhgd,bshd->bhgs", qg, kc) * scale
    if logit_cap:
        s = jnp.tanh(s / logit_cap) * logit_cap
    idx = jnp.arange(S)[None, None, None, :]
    ok = idx <= pos_b[:, None, None, None]
    if swa:
        ok = ok & (pos_b[:, None, None, None] - idx < swa)
    s = jnp.where(ok, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", p, vc)
    return (out.reshape(B, Hq * D), k.reshape(B, Hkv * D),
            v.reshape(B, Hkv * D))


def _setup(B=2, Hq=8, Hkv=2, D=128, S=256, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(B, (Hq + 2 * Hkv) * D)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, S, Hkv * D)), dtype)
    vc = jnp.asarray(rng.normal(size=(B, S, Hkv * D)), dtype)
    pos_b = jnp.asarray([100, 37][:B], jnp.int32)
    return qkv, kc, vc, pos_b


def _check(got, want, atol=2e-2):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=atol)


@pytest.mark.parametrize("swa,cap", [(0, 0.0), (64, 0.0), (0, 30.0)])
@pytest.mark.parametrize("chunk", [64, 512])  # streaming + single-pass
def test_fused_decode_attention_matches_oracle(swa, cap, chunk):
    Hq, Hkv, D = 8, 2, 128
    scale = 1.0 / np.sqrt(D)
    inv_freq = tuple(np.asarray(
        rope_freqs(RopeParams(n_dims=D, mode="neox"))[0]).tolist())
    qkv, kc, vc, pos_b = _setup()
    out, kr, vr = fused_decode_attention(
        qkv, kc, vc, pos_b, inv_freq, Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        swa=swa, logit_cap=cap, chunk=chunk, interpret=True)
    ro, rk, rv = _oracle(qkv, kc, vc, pos_b, inv_freq, Hq, Hkv, D, scale,
                         swa, cap)
    _check(out, ro)
    _check(kr, rk, atol=1e-4)
    _check(vr, rv, atol=1e-6)


def test_fused_decode_attention_no_rope():
    Hq, Hkv, D = 8, 2, 128
    scale = 1.0 / np.sqrt(D)
    qkv, kc, vc, pos_b = _setup(seed=1)
    out, kr, vr = fused_decode_attention(
        qkv, kc, vc, pos_b, None, Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        chunk=128, interpret=True)
    ro, rk, rv = _oracle(qkv, kc, vc, pos_b, None, Hq, Hkv, D, scale)
    _check(out, ro)
    _check(kr, rk, atol=1e-6)


def test_fused_decode_attention_pos_zero():
    """First token: no cache reads, pure self-attention."""
    Hq, Hkv, D = 4, 1, 128
    scale = 1.0 / np.sqrt(D)
    qkv, kc, vc, _ = _setup(B=1, Hq=Hq, Hkv=Hkv, seed=2)
    pos_b = jnp.asarray([0], jnp.int32)
    out, _, _ = fused_decode_attention(
        qkv, kc, vc, pos_b, None, Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        chunk=64, interpret=True)
    ro, _, _ = _oracle(qkv, kc, vc, pos_b, None, Hq, Hkv, D, scale)
    _check(out, ro)


def test_fused_decode_attention_mscale_partial_dims():
    """YaRN attn-scale + partial rotary (n_dims < D)."""
    Hq, Hkv, D = 4, 2, 128
    n_dims = 64
    scale = 1.0 / np.sqrt(D)
    inv_freq = tuple(np.asarray(
        rope_freqs(RopeParams(n_dims=n_dims, mode="neox"))[0]).tolist())
    qkv, kc, vc, pos_b = _setup(Hq=Hq, Hkv=Hkv, seed=3)
    out, kr, _ = fused_decode_attention(
        qkv, kc, vc, pos_b, inv_freq, Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        mscale=1.25, n_dims=n_dims, chunk=64, interpret=True)
    ro, rk, _ = _oracle(qkv, kc, vc, pos_b, inv_freq, Hq, Hkv, D, scale,
                        mscale=1.25, n_dims=n_dims)
    _check(out, ro)
    _check(kr, rk, atol=1e-4)


def _quant_oracle(qkv, kq, vq, kd, vd, pos_b, Hq, Hkv, D, scale):
    """Oracle for an int-quantized cache: dequantize rows then run the
    dense reference (reference analog: flash attention over cache-
    quantized type_k/type_v, llama-graph.cpp:1126-1163)."""
    kc = kq.astype(jnp.float32) * kd[:, :, None]
    vc = vq.astype(jnp.float32) * vd[:, :, None]
    return _oracle(qkv, kc, vc, pos_b, None, Hq, Hkv, D, scale)


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_decode_attention_quant_kv(bits):
    """int8/int4 KV dequantized IN-KERNEL via per-row scales folded into
    scores/probabilities (VERDICT r3 item 5 lifts the int8-only gate)."""
    Hq, Hkv, D, S = 8, 2, 128, 256
    scale = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.normal(size=(2, (Hq + 2 * Hkv) * D)), jnp.float32)
    qmax = 127 if bits == 8 else 7
    it = jnp.int8 if bits == 8 else jnp.int4
    kq = jnp.asarray(rng.integers(-qmax, qmax + 1, (2, S, Hkv * D)), it)
    vq = jnp.asarray(rng.integers(-qmax, qmax + 1, (2, S, Hkv * D)), it)
    kd = jnp.asarray(rng.random((2, S)) * 0.02 + 0.001, jnp.float32)
    vd = jnp.asarray(rng.random((2, S)) * 0.02 + 0.001, jnp.float32)
    pos_b = jnp.asarray([100, 37], jnp.int32)
    out, kr, vr = fused_decode_attention(
        qkv, kq, vq, pos_b, None, k_scale=kd, v_scale=vd,
        Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        chunk=64 if bits == 8 else 512,  # streaming vs single-pass
        interpret=True)
    ro, rk, rv = _quant_oracle(qkv, kq, vq, kd, vd, pos_b, Hq, Hkv, D, scale)
    _check(out, ro)
    _check(kr, rk, atol=1e-5)
    _check(vr, rv, atol=1e-6)


def test_fused_decode_attention_mqa():
    """Hkv=1 (MQA) and G=Hq."""
    Hq, Hkv, D = 8, 1, 128
    scale = 1.0 / np.sqrt(D)
    qkv, kc, vc, pos_b = _setup(B=1, Hq=Hq, Hkv=Hkv, seed=4)
    out, _, _ = fused_decode_attention(
        qkv, kc, vc, pos_b, None, Hq=Hq, Hkv=Hkv, D=D, scale=scale,
        chunk=64, interpret=True)
    ro, _, _ = _oracle(qkv, kc, vc, pos_b, None, Hq, Hkv, D, scale)
    _check(out, ro)
