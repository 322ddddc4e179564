"""Tensor parallelism for the PRODUCTION kernel path (fast planes).

parallel/sharding.py distributes the wire planes and lets GSPMD partition
the XLA fused-dequant fallback — correct, but the Pallas kernel families
(ops/qmm_fast.py interleaved 'il' layout, ops/qmm_qp8.py transposed 't'
layout) are opaque custom calls GSPMD cannot split, so every sharded
configuration silently ran the slow path.  This module makes the fast
path the sharded path:

  * each device holds a VALID STANDALONE plane set for its weight shard —
    col-parallel shards are row slices [N/tp, K], row-parallel shards are
    contraction slices [N, K/tp], both rebuilt host-side from the wire
    planes (quant/pack.slice_rows_host / slice_k_host) so the packed bit
    geometry, scale groups, and qp8 shift-slice periods are all local;
  * the assembled global arrays are the concatenation of the per-shard
    planes along the shard axis, placed with a NamedSharding whose split
    reproduces exactly those per-shard planes on each device;
  * the decode step runs under shard_map: every device executes the SAME
    Pallas kernels on its local planes, and the row-parallel partial sums
    reduce with lax.psum over the 'tp' axis.

This is the TPU rendering of the reference's split-buffer row tensor
parallelism, which runs the same quantized CUDA kernels per row shard and
gathers (ggml/src/ggml-cuda/ggml-cuda.cu:761+, src/llama-model.cpp:317-335
LLAMA_SPLIT_MODE_ROW) — here the per-shard kernels are the qp8/il Mosaic
kernels and the gather is an ICI all-reduce inserted explicitly.
"""
from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.pack import (QTensor, slice_k_host, slice_rows_host,
                          use_qp8_layout)


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert tp <= len(devices), f"need {tp} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:tp]), axis_names=("tp",))


#: weight-key -> shard kind for the standard llama layer (matches
#: parallel/sharding.py's Megatron assignment; fused-projection keys are
#: deliberately absent — shard the RAW per-projection tensors)
WEIGHT_KINDS = {
    "wq": "col", "wk": "col", "wv": "col", "wo": "row",
    "ffn_gate": "col", "ffn_up": "col", "ffn_down": "row",
    "output": "col",
    # col-parallel projection biases slice with their rows
    "bq": "col_vec", "bk": "col_vec", "bv": "col_vec",
    # row-parallel output biases are added on EVERY shard pre-psum:
    # store bias/tp so the reduction reconstructs it exactly
    "bo": "div", "ffn_down_b": "div",
}


def _shard_plane(parts, axis: int, mesh: Mesh):
    """Per-shard numpy planes -> one global jax.Array whose NamedSharding
    split along `axis` reproduces exactly those per-shard planes."""
    if parts[0] is None:
        return None
    assert len({p.shape for p in parts}) == 1, (
        "unequal shard planes: " + str([p.shape for p in parts]))
    glob = np.concatenate(parts, axis=axis)
    spec = [None] * glob.ndim
    spec[axis] = "tp"
    return jax.device_put(glob, NamedSharding(mesh, P(*spec)))


def shard_qtensor_tp(qt: QTensor, mesh: Mesh, kind: str,
                     layout: str | None = None) -> QTensor:
    """Distribute a host (numpy wire-plane) QTensor over the 'tp' axis
    with fast planes built PER SHARD.

    kind 'col': output features shard (wq/wk/wv/gate/up/lm_head).
    kind 'row': contraction dim shards (wo/ffn_down); consumers must psum.
    The layout decision (il vs t) is made ONCE from the GLOBAL geometry so
    all shards (and the single-device reference) agree.
    """
    tp = mesh.shape["tp"]
    assert isinstance(qt.q, np.ndarray), "shard_qtensor_tp needs host planes"
    if tp == 1:
        return qt.astype_device(layout=layout)
    if layout is None:
        layout = "t" if use_qp8_layout(qt.cfg, qt.k, qt.n_pad) else "il"
    if kind == "col":
        assert qt.n % tp == 0, f"n {qt.n} % tp {tp}"
        shards = [slice_rows_host(qt, i * qt.n // tp, (i + 1) * qt.n // tp)
                  for i in range(tp)]
    else:
        assert kind == "row", kind
        assert qt.k % (256 * tp) == 0, f"k {qt.k} must be 256*tp-aligned"
        shards = [slice_k_host(qt, i * qt.k // tp, (i + 1) * qt.k // tp)
                  for i in range(tp)]
    shards = [s.with_fast_planes(layout) for s in shards]
    fl = shards[0].fl if shards[0].fq is not None else "il"
    # plane shard axes: wire planes are [N, f(K)] (col->0, row->1); il fast
    # planes are [N2, f(K)] (same); t fast planes are [f(K), N2] (swapped)
    wire_ax = 0 if kind == "col" else 1
    fast_ax = wire_ax if fl == "il" else 1 - wire_ax

    def wires(name):
        return _shard_plane([getattr(s, name) for s in shards], wire_ax, mesh)

    def fasts(name):
        return _shard_plane([getattr(s, name) for s in shards], fast_ax, mesh)

    return QTensor(qt.cfg, qt.n, qt.k,
                   wires("q"), wires("d"), wires("qh"), wires("sc"),
                   wires("dmin"), wires("m"),
                   fasts("fq"), fasts("fs"), fasts("fb"), fl=fl)


def localize_qtensor(qt, tp: int, kind: str):
    """Fix the (n, k) statics of a QTensor INSIDE shard_map: the leaves
    are this device's shard but tree_unflatten re-attached the global aux
    (qmatmul asserts on k and trims on n)."""
    if not isinstance(qt, QTensor) or tp == 1 or kind not in ("col", "row"):
        return qt
    if kind == "col":
        return QTensor(qt.cfg, qt.n // tp, qt.k, qt.q, qt.d, qt.qh, qt.sc,
                       qt.dmin, qt.m, qt.fq, qt.fs, qt.fb, fl=qt.fl)
    return QTensor(qt.cfg, qt.n, qt.k // tp, qt.q, qt.d, qt.qh, qt.sc,
                   qt.dmin, qt.m, qt.fq, qt.fs, qt.fb, fl=qt.fl)


def _qt_specs(qt: QTensor, kind: str, axis: str = "tp"):
    """A QTensor-of-PartitionSpecs usable as a shard_map in_spec (the
    pytree aux (cfg, n, k, fl) matches the real tensor's)."""
    wire_ax = {"col": 0, "row": 1}.get(kind)

    def ps(a, ax):
        if a is None:
            return None
        if ax is None:
            return P(*([None] * np.ndim(a)))
        spec = [None] * np.ndim(a)
        spec[ax] = axis
        return P(*spec)

    fast_ax = wire_ax if qt.fl == "il" else (
        None if wire_ax is None else 1 - wire_ax)
    return QTensor(qt.cfg, qt.n, qt.k,
                   ps(qt.q, wire_ax), ps(qt.d, wire_ax), ps(qt.qh, wire_ax),
                   ps(qt.sc, wire_ax), ps(qt.dmin, wire_ax),
                   ps(qt.m, wire_ax),
                   ps(qt.fq, fast_ax), ps(qt.fs, fast_ax),
                   ps(qt.fb, fast_ax), fl=qt.fl)


def _leaf_spec(x, kind: str):
    if isinstance(x, QTensor):
        return _qt_specs(x, kind)
    if kind == "col_vec":
        return P("tp")
    return P(*([None] * np.ndim(x)))


def shard_llama_weights_tp(weights: dict, cfg, mesh: Mesh) -> tuple[dict, dict]:
    """Place a HOST llama weight dict (raw projections, numpy wire planes)
    for fast-plane tensor parallelism.  Returns (sharded_weights, specs) —
    specs is the matching shard_map in_spec pytree.

    Unsupported-for-now keys (fused projections, MoE expert stacks) are
    rejected: fused tensors interleave col-shards of several logical
    weights and MoE distribution is parallel/moe.py's job.
    """
    tp = mesh.shape["tp"]
    assert cfg.n_head % tp == 0 and cfg.n_head_kv % tp == 0, (
        f"heads ({cfg.n_head}/{cfg.n_head_kv}) % tp {tp}")
    assert cfg.n_ff % tp == 0 and not cfg.n_head_arr
    bad = {"wqkv", "wqk", "w_gateup", "w_gateup_il", "ffn_gate_exps",
           "ffn_gate_inp"}

    def put(x, kind):
        if isinstance(x, QTensor):
            if kind in ("col", "row"):
                return shard_qtensor_tp(x, mesh, kind)
            return x.astype_device()
        a = jnp.asarray(x)
        if kind == "col_vec":
            assert a.shape[0] % tp == 0
            return jax.device_put(a, NamedSharding(mesh, P("tp")))
        if kind == "div":
            a = a / tp
        return jax.device_put(a, NamedSharding(
            mesh, P(*([None] * a.ndim))))

    out = {"layers": []}
    for key, val in weights.items():
        if key == "layers":
            continue
        assert key not in bad, f"tp_fast: unsupported key {key}"
        out[key] = put(val, WEIGHT_KINDS.get(key, "rep"))
    for lw in weights["layers"]:
        new = {}
        for key, val in lw.items():
            assert key not in bad, f"tp_fast: unsupported key {key}"
            if val is not None:
                new[key] = put(val, WEIGHT_KINDS.get(key, "rep"))
        out["layers"].append(new)

    def spec_of(tree):
        if isinstance(tree, dict):
            return {k: (spec_of(v) if k == "layers" else
                        _leaf_spec(v, WEIGHT_KINDS.get(k, "rep")))
                    for k, v in tree.items()}
        return [
            {k: _leaf_spec(v, WEIGHT_KINDS.get(k, "rep"))
             for k, v in lw.items()} for lw in tree
        ]

    return out, spec_of(out)


def shard_kv_cache_tp(kv: dict, mesh: Mesh) -> dict:
    """Flat KV cache [L, B, S, H_kv*hd]: the head-flat dim shards over
    'tp' in whole-head blocks (tp | n_head_kv).  Quantized caches are out
    of scope here: their scale planes are per-FULL-row, which doesn't
    decompose over a head shard."""
    assert "k_d" not in kv, "tp_fast: quantized KV cache unsupported"
    spec = P(None, None, None, "tp")
    return {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
            for k, v in kv.items()}


def localize_cfg(cfg, tp: int):
    """The shard-local model geometry: each device computes n_head/tp
    heads and n_ff/tp FFN columns (head_dim pinned — it derives from the
    GLOBAL embedding width)."""
    return replace(cfg, n_head=cfg.n_head // tp,
                   n_head_kv=cfg.n_head_kv // tp,
                   n_ff=cfg.n_ff // tp,
                   n_ff_exp=(cfg.n_ff_exp // tp if cfg.n_ff_exp else 0),
                   head_dim=cfg.hd)


def _shard_map(body, mesh, in_specs, out_specs):
    import functools

    try:
        from jax import shard_map as _sm
        return functools.partial(_sm, check_vma=False)(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except (ImportError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        return _sme(body, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_rep=False)


def tp_decode_step(cfg, sweights: dict, wspecs, tokens, kv: dict,
                   pos_start, mesh: Mesh, logits_all: bool = False,
                   compute_dtype=jnp.bfloat16):
    """One decode/prefill step with the Pallas kernels running PER SHARD
    under shard_map.  sweights/wspecs from shard_llama_weights_tp; kv from
    shard_kv_cache_tp.  Returns (logits [B, n_vocab] global, new kv).

    Per-shard graph = the standard forward with the LOCAL head/FFN
    geometry and tp_axis='tp' (models/llama.py): attention runs on local
    heads, wo/ffn_down produce partials psum'd over ICI, the lm_head
    leaves logits vocab-sharded and the out_spec reassembles them.
    """
    from ..models.llama import forward

    tp = mesh.shape["tp"]
    cfg_l = localize_cfg(cfg, tp)
    kv_spec = {k: P(None, None, None, "tp") for k in kv}
    rep2 = P(None, None)

    def body(w, tokens, kv, pos_start):
        w_local = dict(w)
        for key, val in w.items():
            if key == "layers":
                continue
            w_local[key] = localize_qtensor(val, tp, WEIGHT_KINDS.get(key, ""))
        w_local["layers"] = [
            {k: localize_qtensor(v, tp, WEIGHT_KINDS.get(k, ""))
             for k, v in lw.items()} for lw in w["layers"]]
        return forward(cfg_l, w_local, tokens, kv, pos_start,
                       logits_all=logits_all, compute_dtype=compute_dtype,
                       tp_axis="tp")

    out_logits_spec = P(None, None, "tp") if logits_all else P(None, "tp")
    fn = _shard_map(
        body, mesh,
        in_specs=(wspecs, rep2, kv_spec, P()),
        out_specs=(out_logits_spec, kv_spec),
    )
    return fn(sweights, jnp.asarray(tokens),
              kv, jnp.asarray(pos_start, jnp.int32))
