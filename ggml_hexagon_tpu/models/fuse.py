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


def fuse_weights(weights: dict, cfg) -> dict:
    """Return weights with wqkv / w_gateup fused where possible."""
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
    return out
