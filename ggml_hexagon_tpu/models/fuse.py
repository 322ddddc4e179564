"""Weight-fusion transforms — fewer ops per decode step.

Decode on fast chips is op-overhead-bound (each XLA op has fixed launch
cost); fusing Q/K/V into one matmul and gate/up into another removes ~40%
of the per-layer matmuls.  Fusion is a pure relayout: QTensor planes are
row-concatenated (every plane's row axis is the output-feature axis), so
the fused result is bit-identical to the unfused one.

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
    for p in parts:
        if (not isinstance(p, QTensor) or p.cfg != cfg or p.k != k
                or p.q is None or p.n != p.n_pad):
            return None  # wire-less tensors can't be re-fused

    def cat(field):
        arrs = [getattr(p, field) for p in parts]
        if any(a is None for a in arrs):
            return None
        return jnp.concatenate([jnp.asarray(a) for a in arrs], axis=0)

    fused = QTensor(
        cfg, sum(p.n for p in parts), k,
        cat("q"), cat("d"), cat("qh"), cat("sc"), cat("dmin"), cat("m"),
    )
    if any(p.fq is not None for p in parts):
        # rebuild (not concat) the qmm_fast planes: per-part row padding
        # would otherwise leave zero rows in the middle of the fused tensor
        fused = fused.with_fast_planes()
    return fused


def _norm_il(wn, qt: QTensor, plus_one: bool):
    """Pre-interleave a [K] RMS-norm weight to qt's qmm_fast column layout
    (new column j <- original (j % G)*gs + j//G), so the fused norm+matmul
    kernel needs no in-graph transform (ops/qmm_fast.qmatmul_fast_normed)."""
    K = qt.k
    gs = qt.cfg.gs
    G = K // gs
    w = jnp.asarray(wn, jnp.float32)
    if plus_one:  # gemma-class rmsnorm stores w-1
        w = 1.0 + w
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
        gu = lw.get("w_gateup")
        if (isinstance(gu, QTensor) and gu.fq is not None
                and lw.get("ffn_norm") is not None
                and "ffn_norm_b" not in lw and "ffn_gate_inp" not in lw):
            new["ffn_norm_il"] = _norm_il(lw["ffn_norm"], gu, plus_one)
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
        if no_lora and all(isinstance(lw.get(kk), QTensor) for kk in ("ffn_gate", "ffn_up")):
            fused = _concat_qtensors([lw["ffn_gate"], lw["ffn_up"]])
            if fused is not None:
                new["w_gateup"] = fused
                del new["ffn_gate"], new["ffn_up"]
        out["layers"].append(new)
    return attach_norm_planes(out, cfg)
