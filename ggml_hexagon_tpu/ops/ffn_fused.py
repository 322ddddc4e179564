"""Whole-FFN megakernel: wo+residual -> RMSNorm -> gate_up -> act-mul ->
down+residual in ONE Pallas launch (decode hot path).

Round-3 composition measurements (tools/decode_comp.py, docs/
performance.md): the decode step is kernel-bound and each launch carries
~5-20us of fixed cost (pipeline spin-up, drains, dispatch).  Merging the
three FFN-side launches (wo_res, gateup_normed, down_act) into one removes
two launch overheads per layer AND keeps the weight-streaming pipeline
primed across what used to be kernel boundaries: while the last wo block
computes, the first gate_up block's DMA is already in flight.

Structure (grid is one "arbitrary" axis; Mosaic runs steps in order, VMEM
scratch persists across steps):

  phase A  steps [0, nA)            y = x_a @ wo' + h_res  -> h2 scratch
  phase B  steps [nA, nA+nB)        first step: xb = rmsnorm(h2)*wn,
                                    xg_b = group sums (lane-aligned);
                                    then gu[j] = xb @ gup'[j]
  phase C  steps [nA+nB, ...)       first step: xd = act(gate)*up;
                                    out[j] = xd @ down'[j] + h2[j]

Weight layout contracts (models/fuse.py):
  - wo rows pre-permuted by interleave_perm(4096, 32) so h2 lands in the
    il32 layout phase B consumes directly;
  - gate_up rows pre-permuted into down's interleaved column order (the
    existing w_gateup_il transform);
  - down rows pre-permuted by interleave_perm(4096, 32) so the layer
    output stays in il32 — the hidden state circulates interleaved and
    is un-interleaved once per step for the lm_head (models/llama.py).

The down phase applies its affine group bias WITHOUT a group-sum side
input: bias[b,n] = sum_c x[b,c]*fb[n,g(c)] = x_halves_sum @ repeat(fb) —
one extra MXU dot against the repeated bias tile (G=448 for K=14336 is
not lane-splittable, so the in-kernel strided reduce the other phases use
is unavailable; the MXU is ~5% utilized at decode, the extra dot is
free).  Reference analog: the whole FFN sub-graph executing inside one
backend split (build_ffn, src/llama-graph.cpp) — but here it is one
fused device program, not a scheduled split.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.pack import QTensor
from .qmm_fast import (_is_nibble, _offset_bias, _pick_blocks, decode_codes,
                       supports_fused_epilogue)


def _phase_dot(x, fq, fs, reps, nibble: bool, cm: str):
    """One weight block's scaled dot: x [8, K'] bf16 against the packed
    block — the qmm_fast math (split lo/hi nibble dots or byte dot)."""
    sc = pltpu.repeat(fs[:], reps, axis=1).astype(jnp.bfloat16)
    if nibble or cm:
        pu = fq[:]
        if cm:
            lo = decode_codes(cm, (pu & 15).astype(jnp.int32)).astype(
                jnp.bfloat16)
            hi = decode_codes(cm, pu.astype(jnp.int32) >> 4).astype(
                jnp.bfloat16)
        else:
            lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
            hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        half = x.shape[1] // 2
        return (jax.lax.dot_general(
                    x[:, :half], lo * sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    x[:, half:], hi * sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
    if x.shape[0] <= 8:  # f32 byte route (measured faster at decode)
        w = fq[:].astype(jnp.float32)
        return jax.lax.dot_general(
            x.astype(jnp.float32),
            w * pltpu.repeat(fs[:], reps, axis=1).astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    w = fq[:].astype(jnp.bfloat16)
    return jax.lax.dot_general(x, w * sc, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _side_bias(xg, fb):
    return jax.lax.dot_general(xg, fb[:].astype(jnp.float32),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ffn_kernel(d: int, n_ff: int, bnA: int, bnB: int, bnC: int,
                nA: int, nB: int, nC: int, G: int, Gc: int,
                eps: float, act: str,
                dn_nibble: bool, dn_cm: str, dn_off: float,
                *refs):
    (xa_ref, xga_ref, hres_ref, wn_ref,
     wofq, wofs, wofb, gufq, gufs, gufb, dnfq, dnfs, dnfb_or_none,
     out_ref, h2_s, xb_s, xgb_s, gu_s, xd_s) = refs
    j = pl.program_id(0)
    repsA = (d // 2) // G
    repsB = (d // 2) // G
    repsC = ((n_ff // 2) if (dn_nibble or dn_cm) else n_ff) // Gc

    @pl.when(j < nA)
    def _a():
        y = _phase_dot(xa_ref[:], wofq, wofs, repsA, True, "")
        y = y + _side_bias(xga_ref[:].astype(jnp.float32), wofb)
        h2_s[:, pl.ds(j * bnA, bnA)] = (
            y + hres_ref[:, pl.ds(j * bnA, bnA)].astype(jnp.float32))

    @pl.when(j == nA)
    def _norm():
        h2 = h2_s[:]
        inv = jax.lax.rsqrt(jnp.mean(h2 * h2, axis=1, keepdims=True) + eps)
        xb = h2 * inv * wn_ref[:].astype(jnp.float32)
        xb_s[:] = xb.astype(jnp.bfloat16)
        # group sums for the gate_up bias side-dot: il32 layout means
        # column r*G + g belongs to group g — a lane-aligned [8, r, G]
        # reduce (G = d/32 = 128 lanes)
        xgb_s[:] = jnp.sum(xb.reshape(xb.shape[0], d // G, G), axis=1)

    @pl.when(jnp.logical_and(j >= nA, j < nA + nB))
    def _b():
        jj = j - nA
        y = _phase_dot(xb_s[:], gufq, gufs, repsB, True, "")
        y = y + _side_bias(xgb_s[:], gufb)
        gu_s[:, pl.ds(jj * bnB, bnB)] = y

    @pl.when(j == nA + nB)
    def _act():
        g = gu_s[:, :n_ff]
        u = gu_s[:, n_ff:]
        if act == "gelu":
            ga = 0.5 * g * (1.0 + jnp.tanh(
                0.7978845608028654 * (g + 0.044715 * g * g * g)))
        elif act == "relu":
            ga = jnp.maximum(g, 0.0)
        else:
            ga = g * jax.lax.logistic(g)
        xd_s[:] = (ga * u).astype(jnp.bfloat16)

    @pl.when(j >= nA + nB)
    def _c():
        jj = j - nA - nB
        xd = xd_s[:]
        y = _phase_dot(xd, dnfq, dnfs, repsC, dn_nibble, dn_cm)
        # affine bias via the repeated-tile MXU dot (see module docstring)
        if dnfb_or_none is not None:
            fbt = pltpu.repeat(dnfb_or_none[:], repsC, axis=1).astype(
                jnp.bfloat16)
            if dn_nibble or dn_cm:
                half = n_ff // 2
                xs = xd[:, :half] + xd[:, half:]
            else:
                xs = xd
            y = y + jax.lax.dot_general(xs, fbt, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        elif dn_off:
            # offset formats (Q6_K): bias = off * (x-sums against the
            # scale tile) — reuse the scale block
            sct = pltpu.repeat(dnfs[:], repsC, axis=1).astype(jnp.bfloat16)
            if dn_nibble or dn_cm:
                half = n_ff // 2
                xs = xd[:, :half] + xd[:, half:]
            else:
                xs = xd
            y = y + dn_off * jax.lax.dot_general(
                xs, sct, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] = y + h2_s[:, pl.ds(jj * bnC, bnC)]


def supports_ffn_fused(wo, gu_il, dn, d: int, n_ff: int) -> bool:
    """All three projections must carry fast planes with full-K decode
    blockings; wo/gate_up must be plain-nibble Q4_K-class (their bias
    side-dots assume stored fb planes and d-aligned group counts)."""
    for qt in (wo, gu_il, dn):
        if not (isinstance(qt, QTensor) and qt.fq is not None
                and qt.fl == "il"  # megakernel speaks the il32 layout
                and supports_fused_epilogue(qt)):
            return False
    if not (_is_nibble(wo.cfg) and _is_nibble(gu_il.cfg)):
        return False
    if wo.fb is None or gu_il.fb is None:
        return False  # the A/B bias side-dots assume stored fb planes
    G = d // wo.cfg.gs
    if d % G or G % 128 or wo.cfg.gs != gu_il.cfg.gs:
        return False  # phase-B group sums need a lane-aligned G
    if d % 512 or (2 * n_ff) % 1024:
        return False  # phase block sizes
    if wo.n != d or wo.k != d or gu_il.k != d or gu_il.n != 2 * n_ff:
        return False
    if dn.k != n_ff or dn.n != d:
        return False
    if wo.fq.shape[0] != d or gu_il.fq.shape[0] != 2 * n_ff \
            or dn.fq.shape[0] != d:
        return False  # padded rows would land mid-stream
    return True


@functools.partial(jax.jit, static_argnames=(
    "d", "n_ff", "G", "Gc", "eps", "act", "dn_nibble", "dn_cm", "dn_off",
    "interpret"))
def _ffn_call(x_a, xg_a, h_res, wn_il, wofq, wofs, wofb, gufq, gufs, gufb,
              dnfq, dnfs, dnfb, *, d, n_ff, G, Gc, eps, act,
              dn_nibble, dn_cm, dn_off, interpret=False):
    import os

    B = x_a.shape[0]
    bnA = 512
    bnB = int(os.environ.get("GHT_FFN_BNB", "1024"))
    bnC = int(os.environ.get("GHT_FFN_BNC", "512"))
    nA = d // bnA
    nB = (2 * n_ff) // bnB
    nC = d // bnC
    kern = functools.partial(
        _ffn_kernel, d, n_ff, bnA, bnB, bnC, nA, nB, nC, G, Gc,
        eps, act, dn_nibble, dn_cm, dn_off)
    full = lambda j: (0, 0)
    iA = lambda j: (jnp.minimum(j, nA - 1), 0)
    iB = lambda j: (jnp.clip(j - nA, 0, nB - 1), 0)
    iC = lambda j: (jnp.clip(j - nA - nB, 0, nC - 1), 0)
    in_specs = [
        pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),        # x_a
        pl.BlockSpec((B, G), full, memory_space=pltpu.VMEM),        # xg_a
        pl.BlockSpec((B, d), full, memory_space=pltpu.VMEM),        # h_res
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),        # wn
        pl.BlockSpec((bnA, wofq.shape[1]), iA, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnA, G), iA, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnA, G), iA, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnB, gufq.shape[1]), iB, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnB, G), iB, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnB, G), iB, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnC, dnfq.shape[1]), iC, memory_space=pltpu.VMEM),
        pl.BlockSpec((bnC, Gc), iC, memory_space=pltpu.VMEM),
    ]
    args = [x_a.astype(jnp.bfloat16), xg_a, h_res, wn_il.reshape(1, d),
            wofq, wofs, wofb, gufq, gufs, gufb, dnfq, dnfs]
    if dnfb is not None:
        in_specs.append(pl.BlockSpec((bnC, Gc), iC,
                                     memory_space=pltpu.VMEM))
        args.append(dnfb)
    else:
        # keep the kernel arity static: thread a dummy None via closure
        pass
    kern2 = (kern if dnfb is not None
             else (lambda *rs: kern(*rs[:12], None, *rs[12:])))
    return pl.pallas_call(
        kern2,
        grid=(nA + nB + nC,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, bnC), lambda j: (0, iC(j)[0]),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32),        # h2
            pltpu.VMEM((B, d), jnp.bfloat16),       # xb (normed)
            pltpu.VMEM((B, G), jnp.float32),        # xg_b
            pltpu.VMEM((B, 2 * n_ff), jnp.float32),  # gu
            pltpu.VMEM((B, n_ff), jnp.bfloat16),    # xd (act-mul)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * d * (d + 2 * n_ff) + 2 * B * n_ff * d,
            bytes_accessed=int(wofq.size + gufq.size + dnfq.size),
            transcendentals=B * n_ff),
        interpret=interpret,
    )(*args)


def ffn_fused(attn, h, wo: QTensor, gu_il: QTensor, dn: QTensor, wn_il,
              eps: float, act: str = "silu", out_dtype=jnp.bfloat16,
              interpret: bool = False):
    """attn [B<=8, d]: raw attention output (pre-wo); h [B, d]: the
    residual hidden state (ORIGINAL column order).  Returns the layer
    output h' in the original order.

    wo and dn must have their OUTPUT rows pre-permuted by
    interleave_perm(d, gs) (fuse.attach_ffn_fused_layout) so the hidden
    state flows through the kernel in the il32 layout phase B consumes
    without any in-kernel relayout; gu_il is the existing w_gateup_il
    tensor (rows in down's interleaved column order).
    """
    from .qmm_fast import uninterleave_cols

    B, d = attn.shape
    n_ff = dn.k
    gs = wo.cfg.gs
    G = d // gs
    Gc = n_ff // dn.cfg.gs
    Bp = 8
    if B != Bp:
        attn = jnp.pad(attn, ((0, Bp - B), (0, 0)))
        h = jnp.pad(h, ((0, Bp - B), (0, 0)))
    # wo consumes x in ITS interleaved order + its group sums; the
    # residual rides in the same (row-permuted) space as wo's output
    x_a = attn.reshape(Bp, G, gs).swapaxes(1, 2).reshape(Bp, d)
    xg_a = jnp.sum(attn.reshape(Bp, G, gs).astype(jnp.float32), axis=2)
    h_il = h.astype(jnp.float32).reshape(Bp, G, gs).swapaxes(1, 2).reshape(
        Bp, d)
    y = _ffn_call(
        x_a, xg_a, h_il, jnp.asarray(wn_il, jnp.float32),
        wo.fq, wo.fs, wo.fb, gu_il.fq, gu_il.fs, gu_il.fb,
        dn.fq, dn.fs, dn.fb,
        d=d, n_ff=n_ff, G=G, Gc=Gc, eps=float(eps), act=act,
        dn_nibble=_is_nibble(dn.cfg), dn_cm=dn.cfg.code_map,
        dn_off=_offset_bias(dn.cfg, dn.fb), interpret=interpret)
    return uninterleave_cols(y[:B], gs).astype(out_dtype)
