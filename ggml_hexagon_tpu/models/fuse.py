"""Weight-fusion transforms — fewer ops per decode step.

Decode on fast chips is op-overhead-bound (each XLA op has fixed launch
cost); fusing Q/K/V into one matmul and gate/up into another removes ~40%
of the per-layer matmuls.  The QTensor relayout itself is bit-exact
(planes row-concatenated; every plane's row axis is the output-feature
axis).  Two further transforms change DECODE NUMERICS slightly and are
covered by tolerance tests (tests/test_fuse_numerics.py), not
bit-identity: attach_norm_planes folds the pre-matmul RMSNorm into the
qmm kernel (in-kernel bf16 rms + pre-norm bias group sums), and
permute_rope_neox reorders head dims (rope rotation is then computed in
a different but mathematically equal pairing).

Only same-qtype, unpadded (n % 128 == 0) projections fuse; anything else
is left as-is (the forward handles both shapes).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..quant.pack import QTensor


def _concat_qtensors(parts: list[QTensor]) -> QTensor | None:
    cfg = parts[0].cfg
    k = parts[0].k
    fl = parts[0].fl
    for p in parts:
        if (not isinstance(p, QTensor) or p.cfg != cfg or p.k != k
                or p.n != p.n_pad or p.fl != fl):
            return None
    # fast planes stack on their output-feature axis (interleaved: rows;
    # transposed qp8: lanes)
    fax = 1 if fl == "t" else 0

    def cat(field, axis=0):
        arrs = [getattr(p, field) for p in parts]
        if any(a is None for a in arrs):
            return None
        return jnp.concatenate([jnp.asarray(a) for a in arrs], axis=axis)

    def planes_unpadded():
        return all(p.fq is not None and p.fq.shape[fax] == p.n
                   for p in parts)

    if all(p.q is not None for p in parts):
        fused = QTensor(
            cfg, sum(p.n for p in parts), k,
            cat("q"), cat("d"), cat("qh"), cat("sc"), cat("dmin"), cat("m"),
        )
        if any(p.fq is not None for p in parts):
            if planes_unpadded():
                # concat the existing planes (device tensors can't rebuild
                # the transposed layout host-side)
                fused = QTensor(
                    fused.cfg, fused.n, k, fused.q, fused.d, fused.qh,
                    fused.sc, fused.dmin, fused.m, cat("fq", fax),
                    cat("fs", fax), cat("fb", fax), fl=fl)
            else:
                # rebuild: per-part padding would leave zero rows/lanes
                # mid-tensor
                fused = fused.with_fast_planes()
        return fused
    # wire-less tensors: concat the planes directly when unpadded
    if planes_unpadded():
        return QTensor(cfg, sum(p.n for p in parts), k,
                       None, None, None, None, None, None,
                       cat("fq", fax), cat("fs", fax), cat("fb", fax),
                       fl=fl)
    return None


def _norm_il(wn, qt: QTensor, plus_one: bool):
    """Pre-interleave a [K] RMS-norm weight to qt's qmm_fast column layout
    (new column j <- original (j % G)*gs + j//G), so the fused norm+matmul
    kernel needs no in-graph transform (ops/qmm_fast.qmatmul_fast_normed).
    Transposed qp8-layout tensors have no interleave: the weight passes
    through raw (with the gemma +1 applied)."""
    K = qt.k
    gs = qt.cfg.gs
    G = K // gs
    w = jnp.asarray(wn, jnp.float32)
    if plus_one:  # gemma-class rmsnorm stores w-1
        w = 1.0 + w
    if qt.fl == "t":
        return w
    return w.reshape(G, gs).swapaxes(0, 1).reshape(K)


def attach_norm_planes(weights: dict, cfg) -> dict:
    """Attach attn_norm_il / ffn_norm_il per layer where the forward can
    fuse the pre-matmul RMSNorm into the qmm kernel (inference only; the
    original norm tensors stay for every fallback path)."""
    if (getattr(cfg, "norm_type", "rms") != "rms"
            or getattr(cfg, "swin_norm", False)
            or not getattr(cfg, "pre_norms", True)
            or getattr(cfg, "parallel_residual", False)):
        return weights
    plus_one = getattr(cfg, "norm_plus_one", False)
    out = dict(weights)
    out["layers"] = []
    for lw in weights["layers"]:
        new = dict(lw)
        wq = lw.get("wqkv")
        if (isinstance(wq, QTensor) and wq.fq is not None
                and lw.get("attn_norm") is not None
                and "attn_norm_b" not in lw and "bqkv" not in lw):
            new["attn_norm_il"] = _norm_il(lw["attn_norm"], wq, plus_one)
        wqk = lw.get("wqk")
        wv = lw.get("wv")
        if (isinstance(wqk, QTensor) and wqk.fq is not None
                and isinstance(wv, QTensor) and wv.fq is not None
                and lw.get("attn_norm") is not None
                and "attn_norm_b" not in lw):
            # mixed-type QKV: per-tensor planes (interleave depends on the
            # tensor's group size, so wv needs its own)
            new["attn_norm_il"] = _norm_il(lw["attn_norm"], wqk, plus_one)
            new["attn_norm_il_v"] = _norm_il(lw["attn_norm"], wv, plus_one)
        gu = lw.get("w_gateup")
        if (isinstance(gu, QTensor) and gu.fq is not None
                and lw.get("ffn_norm") is not None
                and "ffn_norm_b" not in lw and "ffn_gate_inp" not in lw):
            new["ffn_norm_il"] = _norm_il(lw["ffn_norm"], gu, plus_one)
        out["layers"].append(new)
    return out


def _rope_perm(n_heads: int, hd: int, n_dims: int) -> np.ndarray:
    """Row permutation converting adjacent-pair ("norm") rope layout to
    split-half (NEOX): per head, new dim j reads old dim 2j (j < half) or
    2(j-half)+1; dims beyond n_dims stay put."""
    half = n_dims // 2
    pd = np.arange(hd)
    pd[:half] = 2 * np.arange(half)
    pd[half:n_dims] = 2 * np.arange(half) + 1
    return (np.arange(n_heads)[:, None] * hd + pd[None, :]).reshape(-1)


def _take_rows(w, perm):
    if isinstance(w, QTensor):
        return w.take_rows(perm)
    return w[np.asarray(perm)]


def permute_rope_neox(weights: dict, cfg):
    """Convert a ggml adjacent-pair ("norm") rope model to split-half
    (NEOX) pairing by permuting the Q/K projection OUTPUT rows once at
    load (the inverse of what convert_hf_to_gguf's permute() did).

    q.k dot products are invariant (both sides permuted identically), the
    value path never sees head_dim order, and context-shift re-rotation
    uses the returned cfg (rope_mode="neox") — so the model function is
    bit-unchanged while rope becomes lane-friendly for the fused decode
    kernel (ops/decode_attn.py) and identical to HF rotate-half.

    Returns (weights', cfg').  No-op (returns inputs) when the model
    doesn't qualify (non-"norm" rope, M-RoPE sections, LoRA attached).
    """
    from dataclasses import replace

    if getattr(cfg, "rope_mode", None) != "norm" or getattr(
            cfg, "rope_sections", ()):
        return weights, cfg
    hd = cfg.hd
    n_dims = cfg.rope_n_dims or hd
    if n_dims % 2 or n_dims > hd:
        return weights, cfg
    if any(key.endswith("_lora")
           for lw in weights["layers"] for key in lw):
        return weights, cfg  # adapters target the unpermuted rows
    out = dict(weights)
    out["layers"] = []
    pd = _rope_perm(1, hd, n_dims)
    for il, lw in enumerate(weights["layers"]):
        new = dict(lw)
        nh, nhkv = cfg.nh(il), cfg.nhkv(il)
        has_attn = ("wq" in lw or "wqkv" in lw or "wqk" in lw) and nhkv > 0
        if has_attn:
            pq = _rope_perm(nh, hd, n_dims)
            pk = _rope_perm(nhkv, hd, n_dims)
            if "wqkv" in lw:
                nq, nk = nh * hd, nhkv * hd
                perm = np.concatenate([pq, nq + pk,
                                       nq + nk + np.arange(nk)])
                new["wqkv"] = _take_rows(lw["wqkv"], perm)
                if "bqkv" in lw:
                    new["bqkv"] = lw["bqkv"][np.asarray(perm)]
            else:
                new["wq"] = _take_rows(lw["wq"], pq)
                new["wk"] = _take_rows(lw["wk"], pk)
                if "bq" in lw:
                    new["bq"] = lw["bq"][np.asarray(pq)]
                if "bk" in lw:
                    new["bk"] = lw["bk"][np.asarray(pk)]
            # QK-norm weights act on the (now permuted) head_dim order
            for key, p_flat in (("attn_q_norm", pq), ("attn_k_norm", pk),
                                ("attn_q_norm_b", pq), ("attn_k_norm_b", pk)):
                w = lw.get(key)
                if w is None:
                    continue
                if w.ndim == 2 and w.shape[-1] == hd:
                    new[key] = w[:, np.asarray(pd)]
                elif w.ndim == 1 and w.shape[0] == hd:
                    new[key] = w[np.asarray(pd)]
                elif w.ndim == 1:  # olmo2-style flat norm over the output
                    new[key] = w[np.asarray(p_flat[: w.shape[0]])]
        out["layers"].append(new)
    return out, replace(cfg, rope_mode="neox")


def interleave_gateup_rows(weights: dict, cfg) -> dict:
    """Replace w_gateup with w_gateup_il: the fused gate_up projection with
    its OUTPUT rows pre-permuted into ffn_down's qmm_fast interleaved
    column order (per half — gate rows stay in the first half).  The
    decode graph then feeds the raw gate_up output straight into the
    fused act-mul + down-projection kernel (ops/qmm_fast.qmatmul_fast_act)
    with zero relayout ops; the act-mul intermediate never exists in HBM.

    Elementwise act-mul commutes with any column permutation applied
    identically to both halves, so prefill paths stay exact too
    (models/llama._dense_ffn handles the reordered output)."""
    from ..ops.qmm_fast import interleave_perm, supports_fused_epilogue

    if getattr(cfg, "act", "silu") not in ("silu", "gelu", "relu"):
        return weights
    out = dict(weights)
    out["layers"] = []
    for lw in weights["layers"]:
        new = dict(lw)
        gu = lw.get("w_gateup")
        dn = lw.get("ffn_down")
        if (isinstance(gu, QTensor) and gu.fq is not None
                and isinstance(dn, QTensor) and supports_fused_epilogue(dn)
                and gu.n == 2 * dn.k and gu.n % 2 == 0
                and not any(k in lw for k in (
                    "ffn_down_b", "ffn_sub_norm", "ffn_down_scale",
                    "ffn_down_lora", "ffn_gate_inp"))):
            if dn.fl == "t":
                # qp8 layout consumes the gate_up output in NATURAL
                # column order — the rename alone routes the decode
                # graph through the fused act+down kernel
                new["w_gateup_il"] = gu
            else:
                perm = interleave_perm(dn.k, dn.cfg.gs)
                full = np.concatenate([perm, dn.k + perm])
                new["w_gateup_il"] = gu.take_rows(full)
            del new["w_gateup"]
        out["layers"].append(new)
    return out


def attach_ffn_fused_layout(weights: dict, cfg) -> dict:
    """Prepare layers for the whole-FFN megakernel (ops/ffn_fused.py):
    permute wo's and ffn_down's OUTPUT rows by interleave_perm(d, 32) so
    the hidden state streams through the kernel in the il32 layout with
    zero in-kernel relayouts.  The permutation is applied IN PLACE (no
    plane duplication); prefill/fallback paths un-permute the projection
    outputs with one cheap XLA relayout (models/llama.py, flag "ffp")."""
    import os

    from ..ops.ffn_fused import supports_ffn_fused
    from ..ops.qmm_fast import interleave_perm

    # OFF by default: the same-process A/B (tools/minibench.py --ab-ffp)
    # measured the megakernel at 3.264 vs the 3-launch split's 3.172
    # ms/step on the 8-layer slice — XLA already queues the split
    # launches back-to-back, and the megakernel's phase serialization +
    # bias-tile dot cost more than two launch overheads.  Kept as an
    # opt-in for future runtimes where dispatch is costlier.
    if os.environ.get("GHT_FFN_FUSED", "0") != "1":
        return weights
    if (getattr(cfg, "norm_type", "rms") != "rms"
            or getattr(cfg, "act", "silu") not in ("silu", "gelu", "relu")
            or getattr(cfg, "post_norms", False)
            or getattr(cfg, "swin_norm", False)
            or getattr(cfg, "parallel_residual", False)
            or getattr(cfg, "residual_scale", 1.0) != 1.0
            or not getattr(cfg, "pre_norms", True)):
        return weights
    d = cfg.n_embd
    out = dict(weights)
    out["layers"] = []
    for lw in weights["layers"]:
        new = dict(lw)
        wo = lw.get("wo")
        gu = lw.get("w_gateup_il")
        dn = lw.get("ffn_down")
        if (isinstance(wo, QTensor) and isinstance(gu, QTensor)
                and isinstance(dn, QTensor)
                and all(t.fl == "il" for t in (wo, gu, dn))  # megakernel
                # speaks the interleaved il32 layout only
                and "ffn_norm_il" in lw
                and not any(k in lw for k in (
                    "wo_lora", "wo_scale", "bo", "attn_sub_norm",
                    "ffn_down_lora", "ffn_down_b", "ffn_down_scale",
                    "ffn_sub_norm", "cvec", "ffn_gate_inp"))
                and supports_ffn_fused(wo, gu, dn, d, dn.k)):
            perm = interleave_perm(d, 32)
            new["wo"] = wo.take_rows(perm)
            new["ffn_down"] = dn.take_rows(perm)
            # key PRESENCE is the flag: None is an empty pytree
            # subtree, so the marker stays STATIC under jit (a bool
            # leaf would trace and break `if lw.get("ffp")`)
            new["ffp"] = None
        out["layers"].append(new)
    return out


def fuse_weights(weights: dict, cfg) -> dict:
    """Return weights with wqkv / w_gateup fused where possible, plus
    pre-interleaved norm planes for in-kernel norm+matmul fusion."""
    out = dict(weights)
    out["layers"] = []
    for lw in weights["layers"]:
        new = dict(lw)
        no_lora = not any(key.endswith("_lora") for key in lw)
        if (
            no_lora
            and not cfg.attn_bias
            and "attn_q_norm" not in lw
            and all(isinstance(lw.get(kk), QTensor) for kk in ("wq", "wk", "wv"))
        ):
            fused = _concat_qtensors([lw["wq"], lw["wk"], lw["wv"]])
            if fused is not None:  # split points derive from cfg (static)
                new["wqkv"] = fused
                del new["wq"], new["wk"], new["wv"]
            else:
                # mixed-type QKV (e.g. Q4_K_M bumps attn_v to Q6_K,
                # quant/policy.py): fuse Q+K alone, keep V standalone
                fused2 = _concat_qtensors([lw["wq"], lw["wk"]])
                if fused2 is not None:
                    new["wqk"] = fused2
                    del new["wq"], new["wk"]
        if no_lora and all(isinstance(lw.get(kk), QTensor) for kk in ("ffn_gate", "ffn_up")):
            fused = _concat_qtensors([lw["ffn_gate"], lw["ffn_up"]])
            if fused is not None:
                new["w_gateup"] = fused
                del new["ffn_gate"], new["ffn_up"]
        out["layers"].append(new)
    return attach_ffn_fused_layout(
        interleave_gateup_rows(attach_norm_planes(out, cfg), cfg), cfg)
