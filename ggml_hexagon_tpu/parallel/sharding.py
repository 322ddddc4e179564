"""Multi-chip sharding: mesh construction + weight/KV partition specs.

Replaces the reference's two distribution mechanisms (SURVEY §2.10):
- LLAMA_SPLIT_MODE_ROW tensor parallel (split-buffer type, ggml-cuda.cu:761)
  -> NamedSharding of QTensor planes over the 'tp' mesh axis; XLA GSPMD
  inserts the all-reduces the split-buffer backend did by hand.
- ggml-rpc multi-node (ggml-rpc.cpp) -> jax.distributed + the same mesh
  spanning hosts; collectives ride ICI/DCN instead of a TCP replay protocol.

Megatron-style layout: column-parallel QKV/gate/up (shard output features =
attention heads), row-parallel o/down (shard the contraction dim; partial
sums all-reduced).  The packed planes of a QTensor shard exactly like the
dense matrix they encode because every plane's axes are proportional to
(N, K).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.pack import QTensor


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * tp <= len(devices), f"need {dp*tp} devices, have {len(devices)}"
    devs = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, axis_names=("dp", "tp"))


def _shard_qtensor(qt: QTensor, mesh: Mesh, spec: P) -> QTensor:
    """Apply the 2-D spec to every plane (all axes scale with N, K).

    A plane axis that isn't divisible by its mesh-axis size (e.g. the d
    plane's K/256 columns on a tiny test model) is replicated instead;
    GSPMD reconciles mixed layouts in the fused dequant expression.
    """

    def put(a):
        if a is None:
            return None
        a = jnp.asarray(a)
        axes = []
        for dim, ax in zip(a.shape, spec):
            n_shards = mesh.shape[ax] if ax else 1
            axes.append(ax if ax and dim % n_shards == 0 else None)
        return jax.device_put(a, NamedSharding(mesh, P(*axes)))

    return QTensor(qt.cfg, qt.n, qt.k, put(qt.q), put(qt.d), put(qt.qh),
                   put(qt.sc), put(qt.dmin), put(qt.m))


def _put(x, mesh: Mesh, spec: P):
    if isinstance(x, QTensor):
        return _shard_qtensor(x, mesh, spec)
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def shard_llama_weights(weights: dict, cfg, mesh: Mesh) -> dict:
    """Place weights for tensor parallelism over mesh axis 'tp'.

    col-parallel (shard N / output rows): wq wk wv ffn_gate ffn_up output
    row-parallel (shard K / contraction): wo ffn_down
    replicated: norms, token embedding (lookup is cheap; vocab-sharding the
    embedding would make every lookup a collective).
    """
    tp = mesh.shape["tp"]
    assert cfg.n_head % tp == 0, f"n_head {cfg.n_head} % tp {tp}"
    assert cfg.n_head_kv % tp == 0 or tp % cfg.n_head_kv == 0, (
        f"n_head_kv {cfg.n_head_kv} vs tp {tp}"
    )
    assert cfg.n_ff % tp == 0, f"n_ff {cfg.n_ff} % tp {tp}"
    col = P("tp", None)  # shard output features
    row = P(None, "tp")  # shard contraction dim
    rep = P()
    out = {
        "tok_embd": _put(weights["tok_embd"], mesh, rep),
        "output_norm": _put(weights["output_norm"], mesh, rep),
        "output": _put(weights["output"], mesh, col),
        "layers": [],
    }
    specs = {
        "attn_norm": rep, "ffn_norm": rep,
        "wq": col, "wk": col, "wv": col, "wqkv": col,
        "wo": row, "w_gateup": col, "w_gateup_il": col,
        "ffn_gate": col, "ffn_up": col, "ffn_down": row,
        # MoE: stacked expert tensors row-shard over tp = expert parallelism
        # (tp | n_expert keeps each expert's row block within one shard; the
        # per-expert compute then runs on its owner devices — the all-to-all
        # the reference lacks entirely, SURVEY §2.10)
        "ffn_gate_inp": rep,
        "ffn_gate_exps": col, "ffn_up_exps": col, "ffn_down_exps": col,
        "ffn_gate_inp_shexp": rep, "ffn_gate_shexp": col,
        "ffn_up_shexp": col, "ffn_down_shexp": row,
        "bq": rep, "bk": rep, "bv": rep,
        "attn_q_norm": rep, "attn_k_norm": rep,
        "post_attn_norm": rep, "post_ffn_norm": rep, "cvec": rep,
    }
    if cfg.n_expert:
        assert cfg.n_expert % tp == 0 or tp % cfg.n_expert == 0 or tp == 1, (
            f"n_expert {cfg.n_expert} vs tp {tp}: expert blocks must align"
        )
    for lw in weights["layers"]:
        new = {}
        for key, val in lw.items():
            spec = specs.get(key, rep)
            new[key] = _put(val, mesh, spec) if val is not None else None
        out["layers"].append(new)
    return out


def shard_kv_cache(kv: dict, mesh: Mesh) -> dict:
    """KV cache [L, B, S, H_kv*hd] (flat head dim): batch over dp, heads
    over tp — tp <= n_head_kv keeps shard boundaries head-aligned."""
    spec = P(None, "dp", None, "tp")
    return {k: jax.device_put(v, NamedSharding(mesh, spec)) for k, v in kv.items()}


def shard_tokens(tokens, mesh: Mesh):
    return jax.device_put(jnp.asarray(tokens), NamedSharding(mesh, P("dp", None)))


# ---------------------------------------------------------------------------
# sequence-parallel KV (the SURVEY §5.7 long-context distribution piece)
# ---------------------------------------------------------------------------

def make_sp_mesh(sp: int, tp: int = 1, devices=None) -> Mesh:
    """Mesh with a sequence-parallel axis: KV cache slots shard over 'sp'
    (heads optionally over 'tp').  The reference has NO context-parallel
    story (SURVEY §5.7); on TPU the mesh-native form is a sharding
    annotation — GSPMD turns the attention softmax/contraction over the
    sharded S axis into all-reduce/all-gather collectives riding ICI
    (ring attention by compiler), no bespoke communication code."""
    devices = devices if devices is not None else jax.devices()
    assert sp * tp <= len(devices)
    devs = np.asarray(devices[: sp * tp]).reshape(sp, tp)
    return Mesh(devs, axis_names=("sp", "tp"))


def shard_kv_cache_seq(kv: dict, mesh: Mesh) -> dict:
    """KV cache [L, B, S, H*hd]: cache SLOTS shard over 'sp' (sequence
    dim); scale planes [L, B, S] likewise.  Weights stay replicated (or
    tp-sharded via shard_llama_weights on the same mesh)."""
    out = {}
    for name, v in kv.items():
        spec = P(None, None, "sp") if v.ndim == 3 else P(None, None, "sp", None)
        out[name] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
