"""Fused single-token decode attention: rope + GQA cache attention in ONE
Mosaic kernel.

Round-1 measurement (docs/performance.md): the decode tail is
dispatch-bound — ~0.11 ms/layer of ~10 us XLA kernels (rope chain, cache
updates, score/mask/softmax/weighted-sum) plus ~0.04 ms/layer of
attention-KV reads.  This kernel collapses the rope + attention chain into
one launch per layer; the cache write leaves the kernel entirely and
happens ONCE per step for all layers (a single bulk dynamic_update_slice
on the stacked [L, ...] cache — models/llama.py), which the fresh token's
in-register self-term makes legal: attention reads only slots < pos.

Design notes (all measured on the v5e through the honest-timing protocol):

- the caches keep a flattened head dim [B, S, H*D] so every pipeline block
  is a full-tile [chunk, H*D] slice; per-head slicing of a [chunk, H, D]
  VMEM block costs ~130 us in sublane shuffles — the killer of the naive
  version;
- GQA is computed via a BLOCK-DIAGONAL query matrix [Hq, H*D]
  (q_blk[h*G+g, h*D:(h+1)*D] = q[h*G+g]): scores and the value-weighted
  sum become two dense MXU dots per chunk ([Hq, H*D] x [H*D, chunk] and
  [Hq, chunk] x [chunk, H*D]); the 8x redundant FLOPs are noise next to
  the idle MXU, and no shuffles ever happen;
- chunks stream through the standard pallas grid pipeline (auto
  double-buffered); the index map clamps the chunk index at
  ceil(pos/chunk)-1 via scalar prefetch, so blocks past the live prefix
  are never fetched (same-index blocks are fetched once);
- rope is applied in-kernel (NEOX pairing; ggml adjacent-pair "norm"
  models are converted at load by permuting Q/K projection rows —
  models/fuse.py permute_rope_neox); YaRN mscale folds into cos/sin.

Reference analog: the whole (rope -> cpy -> flash_attn_ext) chain running
inside one backend graph split (src/llama-graph.cpp:1126-1163; the
Hexagon fork's entire point is keeping this loop on the accelerator,
ggml-dsp.c:1192).

Conformance: tests/test_decode_attn.py vs the dense oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _rope_neox(x, cos, sin, n_dims: int):
    """Rotate the first n_dims of x [H, D] by split-half (NEOX) pairing."""
    half = n_dims // 2
    x1 = x[:, :half]
    x2 = x[:, half:n_dims]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=1)
    if n_dims < x.shape[1]:
        rot = jnp.concatenate([rot, x[:, n_dims:]], axis=1)
    return rot


def _block_diag(q, Hkv: int, D: int):
    """[Hq, D] -> [Hq, Hkv*D] with q rows placed on their head's block."""
    Hq = q.shape[0]
    G = Hq // Hkv
    row = jax.lax.broadcasted_iota(jnp.int32, (Hq, D), 0)
    pieces = [jnp.where((row >= h * G) & (row < (h + 1) * G), q, 0.0)
              for h in range(Hkv)]
    return jnp.concatenate(pieces, axis=1)


def _kernel(Hq: int, Hkv: int, D: int, S: int, chunk: int, scale: float,
            mscale: float, swa: int, logit_cap: float, n_dims: int,
            rope: bool, quant: bool,
            *refs):
    if quant:
        (pos_ref, cs_ref, qkv_ref, kc_ref, vc_ref, kd_ref, vd_ref,
         out_ref, k_out, v_out, qblk_s, kf_s, vf_s, m_s, l_s, acc_s) = refs
    else:
        (pos_ref, cs_ref, qkv_ref, kc_ref, vc_ref,
         out_ref, k_out, v_out, qblk_s, kf_s, vf_s, m_s, l_s, acc_s) = refs
        kd_ref = vd_ref = None
    G = Hq // Hkv
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    pos = pos_ref[b]

    @pl.when(c == 0)
    def _init():
        qkv = qkv_ref[0].astype(jnp.float32)  # [1, (Hq+2*Hkv)*D]
        q = qkv[0, : Hq * D].reshape(Hq, D)
        k = qkv[0, Hq * D : (Hq + Hkv) * D].reshape(Hkv, D)
        v = qkv[0, (Hq + Hkv) * D :].reshape(Hkv, D)
        if rope:
            # cos/sin arrive as a kernel INPUT, hoisted to XLA (in-kernel
            # transcendentals cost ~5us/launch, attn_lab r3).  Callers
            # pass inv_freq and the wrapper derives the rows per call;
            # under jit XLA CSEs the identical per-layer computations.
            # The YaRN mscale is folded in before the kernel.
            cs = cs_ref[0]  # [1, n_dims]
            cos = cs[:, : n_dims // 2]
            sin = cs[:, n_dims // 2 :]
            q = _rope_neox(q, cos, sin, n_dims)
            k = _rope_neox(k, cos, sin, n_dims)
        qblk_s[:] = _block_diag(q * scale, Hkv, D)
        kf = k.reshape(1, Hkv * D)
        vf = v.reshape(1, Hkv * D)
        kf_s[:] = kf
        vf_s[:] = vf
        k_out[0] = kf
        v_out[0] = vf
        m_s[:] = jnp.full_like(m_s[:], NEG_INF)
        l_s[:] = jnp.zeros_like(l_s[:])
        acc_s[:] = jnp.zeros_like(acc_s[:])

    @pl.when(c * chunk < pos)
    def _chunk():
        qblk = qblk_s[:]
        kb = kc_ref[0].astype(jnp.float32)  # [chunk, Hkv*D]
        s = jax.lax.dot_general(qblk, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            # int8 KV with per-row scales: the K scale factors OUT of the
            # head_dim contraction, so dequantization is one lane-aligned
            # column scaling of the raw scores (and one probability
            # scaling for V below) — the bf16 cache never exists in HBM.
            # (llama.cpp analog: flash-attn over cache-quantized K/V,
            # llama-graph.cpp:1126-1163 with type_k/type_v.)
            s = s * kd_ref[0]  # [1, chunk] broadcast over rows
        if logit_cap:
            s = jnp.tanh(s / logit_cap) * logit_cap
        idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = idx < pos
        if swa:
            ok = jnp.logical_and(ok, pos - idx < swa)
        s = jnp.where(ok, s, NEG_INF)
        m = m_s[:, :1]
        l = l_s[:, :1]
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        if quant:  # V scale folds into the probabilities (per-row)
            p = p * vd_ref[0]
        acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
            p, vc_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(c == nc - 1)
    def _finalize():
        # fresh token's self-term: its K/V never touched the cache
        qblk = qblk_s[:]
        kf = kf_s[:]
        vf = vf_s[:]
        s_self = jax.lax.dot_general(qblk, kf, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        if logit_cap:
            s_self = jnp.tanh(s_self / logit_cap) * logit_cap
        m = m_s[:, :1]
        l = l_s[:, :1]
        m_new = jnp.maximum(m, s_self)
        alpha = jnp.exp(m - m_new)
        p_self = jnp.exp(s_self - m_new)
        l_new = l * alpha + p_self
        acc = acc_s[:] * alpha + p_self * vf
        o = acc / jnp.maximum(l_new, 1e-30)  # [Hq, Hkv*D]
        # extract each row-group's own head block from the dense product
        parts = [o[h * G : (h + 1) * G, h * D : (h + 1) * D]
                 for h in range(Hkv)]
        out_ref[0] = jnp.concatenate(parts, axis=0).reshape(1, Hq * D)


def _kernel_single(Hq: int, Hkv: int, D: int, S: int, chunk: int,
                   scale: float, mscale: float, swa: int, logit_cap: float,
                   n_dims: int, rope: bool, quant: bool, *refs):
    """One-chunk specialization (NC == 1, cache fits a single block):
    direct softmax, no running max/denominator bookkeeping — saves the
    alpha/exp update chain the streaming form pays per chunk."""
    if quant:
        (pos_ref, cs_ref, qkv_ref, kc_ref, vc_ref, kd_ref, vd_ref,
         out_ref, k_out, v_out, qblk_s, kf_s, vf_s, m_s, l_s, acc_s) = refs
    else:
        (pos_ref, cs_ref, qkv_ref, kc_ref, vc_ref,
         out_ref, k_out, v_out, qblk_s, kf_s, vf_s, m_s, l_s, acc_s) = refs
        kd_ref = vd_ref = None
    G = Hq // Hkv
    b = pl.program_id(0)
    pos = pos_ref[b]
    qkv = qkv_ref[0].astype(jnp.float32)
    q = qkv[0, : Hq * D].reshape(Hq, D)
    k = qkv[0, Hq * D : (Hq + Hkv) * D].reshape(Hkv, D)
    v = qkv[0, (Hq + Hkv) * D :].reshape(Hkv, D)
    if rope:
        cs = cs_ref[0]
        cos = cs[:, : n_dims // 2]
        sin = cs[:, n_dims // 2 :]
        q = _rope_neox(q, cos, sin, n_dims)
        k = _rope_neox(k, cos, sin, n_dims)
    kf = k.reshape(1, Hkv * D)
    vf = v.reshape(1, Hkv * D)
    k_out[0] = kf
    v_out[0] = vf
    qblk = _block_diag(q * scale, Hkv, D)
    s = jax.lax.dot_general(qblk, kc_ref[0].astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if quant:
        s = s * kd_ref[0]
    s_self = jax.lax.dot_general(qblk, kf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if logit_cap:
        s = jnp.tanh(s / logit_cap) * logit_cap
        s_self = jnp.tanh(s_self / logit_cap) * logit_cap
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    ok = idx < pos
    if swa:
        ok = jnp.logical_and(ok, pos - idx < swa)
    s = jnp.where(ok, s, NEG_INF)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_self)
    p = jnp.exp(s - m)
    p_self = jnp.exp(s_self - m)
    l = jnp.sum(p, axis=-1, keepdims=True) + p_self
    if quant:
        p = p * vd_ref[0]
    acc = jax.lax.dot_general(p, vc_ref[0].astype(jnp.float32),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + p_self * vf
    o = acc / jnp.maximum(l, 1e-30)
    parts = [o[h * G : (h + 1) * G, h * D : (h + 1) * D]
             for h in range(Hkv)]
    out_ref[0] = jnp.concatenate(parts, axis=0).reshape(1, Hq * D)


@functools.partial(
    jax.jit,
    static_argnames=("Hq", "Hkv", "D", "scale", "mscale", "swa", "logit_cap",
                     "n_dims", "chunk", "interpret"))
def fused_decode_attention(qkv, k_cache, v_cache, pos, inv_freq, *,
                           k_scale=None, v_scale=None, cos_sin=None,
                           Hq: int, Hkv: int, D: int, scale: float,
                           mscale: float = 1.0, swa: int = 0,
                           logit_cap: float = 0.0, n_dims: int = 0,
                           chunk: int = 1024, interpret: bool = False):
    """qkv [B, (Hq+2*Hkv)*D] f32 (projection output, pre-rope);
    k_cache/v_cache [B, S, Hkv*D] flat caches holding slots < pos (the
    fresh row is NOT read — write it after this call); pos scalar or [B];
    inv_freq [n_dims/2] f32 (None -> caller already roped q/k);
    cos_sin [B, n_dims] f32 cos++sin rows, mscale-folded — MAY be passed
    precomputed; when None (all current callers) they are derived here
    from inv_freq per layer call, and XLA CSEs the identical per-layer
    computations under jit;
    k_scale/v_scale [B, S] f32 per-row scales when the cache is
    int8-quantized (dequantized in-kernel by scaling scores /
    probabilities — the bf16 cache never exists in HBM).

    Returns (attn_out [B, Hq*D] f32, k_roped [B, Hkv*D] f32, v [B, Hkv*D]
    f32) — the caller stores k_roped/v into cache slot pos (for all layers
    at once, quantizing first for a q8_0 cache; see models/llama.py).
    """
    B = qkv.shape[0]
    S = k_cache.shape[1]
    chunk = min(chunk, S)
    rope = inv_freq is not None or cos_sin is not None
    quant = k_scale is not None
    n_dims = n_dims or D
    NC = -(-S // chunk)
    pos_b = jnp.broadcast_to(jnp.reshape(jnp.asarray(pos, jnp.int32), (-1,)),
                             (B,))
    if rope and cos_sin is None:
        ang = (pos_b[:, None].astype(jnp.float32)
               * jnp.asarray(inv_freq, jnp.float32)[None, :])
        cos_sin = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)],
                                  axis=1) * mscale
    if cos_sin is None:
        cos_sin = jnp.zeros((B, 2 * (n_dims // 2)), jnp.float32)
    kern = functools.partial(
        _kernel_single if NC == 1 else _kernel,
        Hq, Hkv, D, S, chunk, scale, mscale, swa, logit_cap,
        n_dims, rope, quant)

    def chunk_idx(b, c, pos_ref):
        # clamp: blocks past the live prefix re-fetch the last needed block
        # (same index -> fetched once); compute is @pl.when-gated anyway
        last = jnp.maximum((pos_ref[b] + chunk - 1) // chunk - 1, 0)
        return (b, jnp.minimum(c, last), 0)

    # per-row operands ride as 3-D [B, 1, W] so every block's last two
    # dims equal the array's ((1, W) blocks of a [B, W] array violate the
    # Mosaic sublane rule for B > 1 — caught by the on-chip conformance
    # sweep; B=1 bench never exercised it)
    in_specs = [
        pl.BlockSpec((1, 1, cos_sin.shape[1]), lambda b, c, pr: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qkv.shape[1]), lambda b, c, pr: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, Hkv * D), chunk_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk, Hkv * D), chunk_idx,
                     memory_space=pltpu.VMEM),
    ]
    args = [pos_b, cos_sin[:, None, :], qkv[:, None, :], k_cache, v_cache]
    if quant:
        def scale_idx(b, c, pos_ref):
            last = jnp.maximum((pos_ref[b] + chunk - 1) // chunk - 1, 0)
            return (b, 0, jnp.minimum(c, last))

        in_specs.append(pl.BlockSpec((1, 1, chunk), scale_idx,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, chunk), scale_idx,
                                     memory_space=pltpu.VMEM))
        args.extend([k_scale[:, None, :], v_scale[:, None, :]])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NC),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, Hq * D), lambda b, c, pr: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, c, pr: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hkv * D), lambda b, c, pr: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hq, Hkv * D), jnp.float32),   # block-diag q
            pltpu.VMEM((1, Hkv * D), jnp.float32),    # fresh roped k row
            pltpu.VMEM((1, Hkv * D), jnp.float32),    # fresh v row
            pltpu.VMEM((Hq, 128), jnp.float32),       # running max
            pltpu.VMEM((Hq, 128), jnp.float32),       # running denom
            pltpu.VMEM((Hq, Hkv * D), jnp.float32),   # running accum
        ],
    )
    out, k_r, v_r = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, Hq * D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Hkv * D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Hkv * D), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return out[:, 0], k_r[:, 0], v_r[:, 0]
