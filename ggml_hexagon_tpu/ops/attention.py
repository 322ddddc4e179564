"""Attention implementations beyond the dense-softmax path.

The reference gates between flash-attention and the KQ-softmax path
(llama-graph.cpp:1126-1163, flash gated on n_kv%256==0).  Here:

- `flash_attention_scan`: the flash algorithm (online softmax over KV
  chunks) expressed with lax.scan — memory O(T x chunk) instead of
  O(T x S), compiles through XLA on any backend.  This is the long-context
  path (dense scores for 8k ctx prefill would materialize gigabytes).
- `flash_attention_pallas`: a Mosaic kernel of the same algorithm (grid
  over (batch*head, q-block), double-buffered KV streaming left to the
  pipeline).  Opt-in: on the current toolchain XLA's fused attention wins
  decode shapes; the kernel exists for conformance + future tuning.

Both are verified against the dense oracle in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def dense_attention(q, k, v, mask, scale: float):
    """Oracle: softmax(scale * q k^T + mask) v.  q [B,H,T,D], k/v [B,H,S,D],
    mask [..., T, S] additive."""
    s = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    s = s * scale + mask
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", p, v, preferred_element_type=jnp.float32)


def flash_attention_scan(q, k, v, mask, scale: float, chunk: int = 512):
    """Online-softmax attention scanning KV in chunks.

    q [B,H,T,D]; k/v [B,H,S,D]; mask [B|1, 1|H, T, S] additive (broadcast ok).
    Returns [B,H,T,D] f32.  S must be a multiple of `chunk` (pad + mask).
    """
    B, H, T, D = q.shape
    S = k.shape[2]
    assert S % chunk == 0, f"S={S} % chunk={chunk}"
    n_chunks = S // chunk
    qf = q.astype(jnp.float32) * scale
    mask = jnp.broadcast_to(mask, (B, H, T, S)).astype(jnp.float32)

    kc = k.reshape(B, H, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, H, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    mc = mask.reshape(B, H, T, n_chunks, chunk).transpose(3, 0, 1, 2, 4)

    def step(carry, inp):
        m_run, l_run, acc = carry
        k_i, v_i, mask_i = inp
        s = jnp.einsum("bhtd,bhsd->bhts", qf, k_i.astype(jnp.float32),
                       preferred_element_type=jnp.float32) + mask_i
        m_new = jnp.maximum(m_run, s.max(axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l_run * alpha + p.sum(axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhts,bhsd->bhtd", p, v_i.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((B, H, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, T), jnp.float32)
    acc0 = jnp.zeros((B, H, T, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(step, (m0, l0, acc0), (kc, vc, mc))
    return acc / jnp.maximum(l, 1e-30)[..., None]


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _flash_kernel(chunk: int, n_chunks: int, scale: float,
                  q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch*head, q-block) cell: stream KV chunks with online softmax.

    q_ref [TQ, D]; k_ref/v_ref [S, D]; mask_ref [TQ, S]; o_ref [TQ, D].
    """
    TQ, D = q_ref.shape[1], q_ref.shape[2]
    qf = q_ref[0].astype(jnp.float32) * scale
    m = jnp.full((TQ, 128), NEG_INF, jnp.float32)  # lane-padded running max
    l = jnp.zeros((TQ, 128), jnp.float32)
    acc = jnp.zeros((TQ, D), jnp.float32)
    for c in range(n_chunks):
        kc = k_ref[0, c * chunk : (c + 1) * chunk, :].astype(jnp.float32)
        vc = v_ref[0, c * chunk : (c + 1) * chunk, :].astype(jnp.float32)
        s = jax.lax.dot_general(qf, kc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + mask_ref[0, :, c * chunk : (c + 1) * chunk]
        m_new = jnp.maximum(m[:, :1], s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m[:, :1] - m_new)
        p = jnp.exp(s - m_new)
        l_new = l[:, :1] * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m = jnp.broadcast_to(m_new, (TQ, 128))
        l = jnp.broadcast_to(l_new, (TQ, 128))
    o_ref[0] = (acc / jnp.maximum(l[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "chunk", "interpret"))
def flash_attention_pallas(q, k, v, mask, scale: float, chunk: int = 256,
                           interpret: bool = False):
    """Pallas flash attention.  q [B,H,T,D], k/v [B,H,S,D], mask [B,H,T,S]."""
    B, H, T, D = q.shape
    S = k.shape[2]
    assert S % chunk == 0
    q2 = q.reshape(B * H, T, D)
    k2 = k.reshape(B * H, S, D)
    v2 = v.reshape(B * H, S, D)
    m2 = jnp.broadcast_to(mask, (B, H, T, S)).reshape(B * H, T, S)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, chunk, S // chunk, scale),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        interpret=interpret,
    )(q2, k2, v2, m2)
    return out.reshape(B, H, T, D)


def flash_attention_cache(qg, k, v, pos_b, T: int, scale: float,
                          swa: int = 0, logit_cap: float = 0.0,
                          chunk: int = 512, k_scale=None, v_scale=None):
    """Cache-attention with chunk-local masks (nothing O(T x S) materializes).

    qg [B, Hkv, G, T, D] grouped queries; k/v [B, Hkv, S, D]; pos_b [B|1]
    row offsets.  Token t of row b attends slot s iff s <= pos_b + t (and
    within the sliding window when swa > 0).  Returns [B, Hkv, G, T, D] f32.

    k_scale/v_scale [B, S]: per-slot scales when k/v hold int8/int4
    cache-quantized values — dequantization happens in-chunk by scaling
    the scores / probabilities (the slot scale factors out of the head_dim
    contraction), so a bf16 copy of the cache never materializes in HBM.
    Reference analog: flash-attn over cache-quantized type_k/type_v,
    llama-graph.cpp:1126-1163 (SURVEY hard part 4).
    """
    B, Hkv, G, T_, D = qg.shape
    S = k.shape[2]
    assert S % chunk == 0, f"S={S} % chunk={chunk}"
    n_chunks = S // chunk
    quant = k_scale is not None
    qf = qg.astype(jnp.float32) * scale
    pos = jnp.reshape(jnp.asarray(pos_b, jnp.int32), (-1, 1, 1, 1, 1))  # [B|1]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, None, None, :, None]

    kc = k.reshape(B, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, Hkv, n_chunks, chunk, D).transpose(2, 0, 1, 3, 4)
    if quant:
        kd = k_scale.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
        vd = v_scale.reshape(B, n_chunks, chunk).transpose(1, 0, 2)
    else:  # dummy chunks keep the scan signature static
        kd = vd = jnp.zeros((n_chunks, B, chunk), jnp.float32)

    def step(carry, inp):
        m_run, l_run, acc, c = carry
        k_i, v_i, kd_i, vd_i = inp
        s = jnp.einsum("bhgtd,bhsd->bhgts", qf, k_i.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if quant:  # per-slot K scale factors out of the D contraction
            s = s * kd_i[:, None, None, None, :]
        if logit_cap:
            s = jnp.tanh(s / logit_cap) * logit_cap
        s_idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, None, None, None, :]
        allowed = s_idx <= (pos + t_idx)
        if swa:
            allowed = allowed & ((pos + t_idx) - s_idx < swa)
        s = jnp.where(allowed, s, NEG_INF)
        m_new = jnp.maximum(m_run, s.max(axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l_run * alpha + p.sum(axis=-1)
        if quant:  # V scale folds into the probabilities
            p = p * vd_i[:, None, None, None, :]
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhgts,bhsd->bhgtd", p, v_i.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new, c + 1), None

    m0 = jnp.full((B, Hkv, G, T), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, Hkv, G, T), jnp.float32)
    acc0 = jnp.zeros((B, Hkv, G, T, D), jnp.float32)
    (m, l, acc, _), _ = jax.lax.scan(step, (m0, l0, acc0, jnp.int32(0)),
                                     (kc, vc, kd, vd))
    return acc / jnp.maximum(l, 1e-30)[..., None]


# ---------------------------------------------------------------------------
# single-token decode attention (Mosaic) — the T=1 hot path
# ---------------------------------------------------------------------------

def _decode_attn_kernel(scale: float, swa: int, logit_cap: float,
                        Hkv: int, pos_ref, q_ref, k_ref, v_ref, o_ref):
    """One batch row: q [Hkv, G, D], k/v [S, Hkv, D] -> out [Hkv, G, D].

    Fuses scores + causal/SWA mask + softmax + weighted sum into one kernel
    (the XLA path is ~6 small kernels per layer; at ~10us fixed cost each
    that tail dominates decode past the weight streaming).  KV heads are
    unrolled in-kernel so the cache blocks keep their natural layout
    (Mosaic requires the trailing block dims to be full or 8/128-aligned).
    """
    pos = pos_ref[0]
    for h in range(Hkv):
        q = q_ref[0, h].astype(jnp.float32) * scale      # [G, D]
        k = k_ref[0, :, h, :].astype(jnp.float32)        # [S, D]
        v = v_ref[0, :, h, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [G, S]
        if logit_cap:
            s = jnp.tanh(s / logit_cap) * logit_cap
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = idx <= pos
        if swa:
            ok = jnp.logical_and(ok, pos - idx < swa)
        s = jnp.where(ok, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, h] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def decode_attention_pallas(qg, k, v, pos_b, scale: float, swa: int = 0,
                            logit_cap: float = 0.0, interpret: bool = False):
    """Fused single-token GQA cache attention.

    qg [B, Hkv, G, 1, D]; k/v [B, S, Hkv, D] (cache layout); pos_b scalar or
    [B].  Returns [B, Hkv, G, 1, D] f32.  Whole-(S, Hkv) blocks: use only
    when S*Hkv*D fits VMEM (gated by the caller).
    """
    B, Hkv, G, T, D = qg.shape
    assert T == 1
    S = k.shape[1]
    q2 = qg.reshape(B, Hkv, G, D)
    pos = jnp.broadcast_to(jnp.reshape(jnp.asarray(pos_b, jnp.int32), (-1,)),
                           (B,))
    kern = functools.partial(_decode_attn_kernel, scale, swa, logit_cap, Hkv)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1,), lambda b: (b,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hkv, G, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.float32),
        interpret=interpret,
    )(pos, q2, k, v)
    return out.reshape(B, Hkv, G, 1, D)
