"""Pipeline (stage) parallelism — layer ranges sharded over a 'pp' mesh axis,
optionally composed with tensor parallelism over 'tp'.

Reference counterparts:
  - LLAMA_SPLIT_MODE_LAYER: contiguous layer ranges per device
    (src/llama-model.cpp:1386-1419 buft assignment).
  - Micro-batch pipeline parallelism: the scheduler's n_copies>1 event
    double-buffering (ggml/src/ggml-backend.cpp:663-667, enabled in
    src/llama-context.cpp:253-283 when a model is layer-split over >=2
    devices).
  - LLAMA_SPLIT_MODE_ROW tensor parallel (llama.h:218) — composed here as
    the inner 'tp' mesh axis (the reference can only pick ONE split mode).

TPU-native design: instead of per-split tensor copies + events, the layer
stack is a stacked pytree sharded over the 'pp' mesh axis and the whole
GPipe schedule is ONE jitted shard_map program — each rank scans its local
layers (lax.scan), activations hop stage-to-stage with lax.ppermute, and
micro-batches fill the bubble exactly like the reference's n_copies
round-robin.  With tp > 1 each stage additionally shards heads/FFN columns
over 'tp', reducing partial outputs with lax.psum — collectives ride ICI
and overlap the quantized matmuls.

Scope: the standard LLaMA-family layer (RMS pre-norms, GQA + RoPE, SwiGLU)
— the flagship decode path.  Full-feature archs keep tp/dp GSPMD sharding
(parallel/sharding.py); pp(+tp) composes for > HBM models.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (_attention, _kv_write, apply_rope, embed, matmul)
from ..ops.basic import rms_norm, silu
from ..quant.pack import QTensor


def make_pp_mesh(pp: int, tp: int = 1, devices=None) -> Mesh:
    devs = np.array(devices if devices is not None
                    else jax.devices()[: pp * tp])
    return Mesh(devs.reshape(pp, tp), axis_names=("pp", "tp"))


def stack_layers(weights: dict):
    """Per-layer dicts -> one stacked pytree with leading n_layer axis.

    Requires homogeneous layers (same tensor set / shapes), which holds for
    the standard-llama families this path serves."""
    layers = weights["layers"]
    keys = set(layers[0])
    for lw in layers[1:]:
        assert set(lw) == keys, "pipeline needs homogeneous layers"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


# after layer-stacking, plane axis 1 = output features (col) and the
# trailing axes derive from K (row).  col-parallel shards axis 1, row-
# parallel shards the K-derived axis (last axis for every QTensor plane).
_COL_KEYS = ("wq", "wk", "wv", "ffn_gate", "ffn_up")
_ROW_KEYS = ("wo", "ffn_down")


def _weight_spec(key: str, x) -> P:
    if key in _COL_KEYS:
        return P("pp", "tp", *([None] * (x.ndim - 2)))
    if key in _ROW_KEYS:
        return P("pp", *([None] * (x.ndim - 2)), "tp")
    return P("pp", *([None] * (x.ndim - 1)))


def shard_pipeline(weights: dict, kv: dict, mesh: Mesh):
    """Place the stacked layer pytree + KV over ('pp'[, 'tp']);
    embedding/head replicated (they run outside the pipeline body)."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    tp = mesh.shape.get("tp", 1)
    stacked_raw = stack_layers(weights)

    def strip_fast(qt, key):
        """tp>1: the per-ndim specs can only express col-sharding of the
        INTERLEAVED fast layout (plane rows = output features); t-layout
        and row-parallel fast planes would mis-shard, so those fall back
        to wire planes per rank (parallel/tp_fast.py holds the full
        fast-plane TP story for the non-pipelined path)."""
        if (not isinstance(qt, QTensor) or qt.fq is None or qt.q is None
                or (key in _COL_KEYS and qt.fl == "il")):
            return qt
        return QTensor(qt.cfg, qt.n, qt.k, qt.q, qt.d, qt.qh, qt.sc,
                       qt.dmin, qt.m)

    stacked = {}
    for key, val in stacked_raw.items():
        if tp > 1 and key in _COL_KEYS + _ROW_KEYS:
            val = strip_fast(val, key)
            stacked[key] = jax.tree.map(
                lambda x, k=key: put(x, _weight_spec(k, x)), val)
        else:
            stacked[key] = jax.tree.map(
                lambda x: put(x, P("pp", *([None] * (x.ndim - 1)))), val)
    pw = {
        "tok_embd": put(weights["tok_embd"], P()),
        "output_norm": put(weights["output_norm"], P()),
        "output": jax.tree.map(lambda x: put(x, P()), weights["output"]),
        "layers_stacked": stacked,
    }
    # flat KV cache [L, B, S, H*hd]: the head shard boundary stays aligned
    # because tp <= n_head_kv (heads divide the flat dim evenly)
    kv_spec = (P("pp", None, None, "tp") if tp > 1 else
               P("pp", None, None, None))
    kv = {k: put(v, kv_spec) for k, v in kv.items()}
    return pw, kv


def _localize(w):
    """Rebuild a QTensor's (n, k) aux from its LOCAL plane shapes — inside
    shard_map the planes are this rank's block but the aux still carries the
    global sizes (qmatmul asserts on k and trims on n).  Fast planes ride
    along (with their layout tag) so the per-rank matmuls keep the Pallas
    path; layer-stacked planes carry a leading L_loc axis the per-layer
    scan strips before this runs."""
    if not isinstance(w, QTensor):
        return w
    if w.q is not None:
        local_k = w.q.shape[-1] * 8 // w.cfg.bits_lo
        local_n = w.q.shape[0]
    elif w.fl == "t":  # wire-less: derive from the transposed fast planes
        local_k = w.fs.shape[0] * w.cfg.gs
        local_n = min(w.n, w.fq.shape[1])
    else:
        local_k = w.fs.shape[1] * w.cfg.gs
        local_n = min(w.n, w.fq.shape[0])
    return QTensor(w.cfg, local_n, local_k, w.q, w.d, w.qh, w.sc,
                   w.dmin, w.m, w.fq, w.fs, w.fb, fl=w.fl)


def _layer(cfg, lw, h, kv_k, kv_v, positions, pos_start, T, scale,
           compute_dtype, tp: int = 1):
    """One standard llama layer on a micro-batch slice [b, T, D].

    With tp > 1, lw holds this rank's head/column shard; wo and ffn_down
    produce partial sums reduced with psum over 'tp' (the GSPMD all-reduce
    the reference's row-split TP does via its split-buffer gather)."""
    b = h.shape[0]
    nh_loc = cfg.n_head // tp
    nhkv_loc = cfg.n_head_kv // tp
    a = rms_norm(h, lw["attn_norm"], cfg.rms_eps)
    q = matmul(a, _localize(lw["wq"])).reshape(b, T, nh_loc, cfg.hd)
    k = matmul(a, _localize(lw["wk"])).reshape(b, T, nhkv_loc, cfg.hd)
    v = matmul(a, _localize(lw["wv"])).reshape(b, T, nhkv_loc, cfg.hd)
    q = apply_rope(q, positions, cfg.rope_params)
    k = apply_rope(k, positions, cfg.rope_params)
    k_l = _kv_write(kv_k, k, pos_start)
    v_l = _kv_write(kv_v, v, pos_start)
    S = k_l.shape[1]
    attn = _attention(cfg, q, k_l.reshape(b, S, nhkv_loc, cfg.hd),
                      v_l.reshape(b, S, nhkv_loc, cfg.hd), pos_start, T,
                      scale=scale).astype(compute_dtype)
    attn_out = matmul(attn, _localize(lw["wo"]))
    if tp > 1:
        attn_out = jax.lax.psum(attn_out, "tp")
    h = h + attn_out.astype(compute_dtype)
    f = rms_norm(h, lw["ffn_norm"], cfg.rms_eps)
    gu = (silu(matmul(f, _localize(lw["ffn_gate"])))
          * matmul(f, _localize(lw["ffn_up"])))
    ffn_out = matmul(gu.astype(compute_dtype), _localize(lw["ffn_down"]))
    if tp > 1:
        ffn_out = jax.lax.psum(ffn_out, "tp")
    h = h + ffn_out.astype(compute_dtype)
    return h, k_l, v_l


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_micro", "compute_dtype"))
def pipeline_forward(cfg, pweights, tokens, kv, pos_start, mesh: Mesh,
                     n_micro: int = 2, compute_dtype=jnp.bfloat16):
    """GPipe decode step: [B, T] tokens -> ([B, n_vocab] logits, new kv).

    B is cut into n_micro micro-batches; with S pipeline stages the schedule
    runs n_micro + S - 1 ticks.  Per tick each stage: receives its
    predecessor's activations (ppermute), runs its local layer scan, and
    hands off — the TPU rendering of compute_splits' async copy + event wait
    (ggml-backend.cpp:1355-1500).  With a 'tp' mesh axis each stage runs
    tensor-parallel internally (psum-reduced row splits)."""
    S = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    B, T = tokens.shape
    assert B % n_micro == 0 and cfg.n_layer % S == 0
    if tp > 1:
        assert cfg.n_head % tp == 0 and cfg.n_head_kv % tp == 0
    b_mb = B // n_micro
    scale = 1.0 / float(np.sqrt(cfg.hd))
    pos_vec = jnp.reshape(jnp.asarray(pos_start, jnp.int32), (-1, 1))
    positions = pos_vec + jnp.arange(T, dtype=jnp.int32)[None, :]

    h_all = embed(pweights["tok_embd"], tokens, compute_dtype)
    h_mb = h_all.reshape(n_micro, b_mb, T, cfg.n_embd)

    def stage_prog(stacked, h_mb, kv_k, kv_v):
        # per-rank views: stacked/kv have local leading dim L_loc = n_layer/S
        rank = jax.lax.axis_index("pp")
        n_steps = n_micro + S - 1
        carry0 = jnp.zeros((b_mb, T, cfg.n_embd), compute_dtype)
        out0 = jnp.zeros((n_micro, b_mb, T, cfg.n_embd), compute_dtype)

        def tick(step, state):
            carry, outputs, kv_k, kv_v = state
            # hand last tick's result downstream; rank 0 receives zeros
            recv = jax.lax.ppermute(
                carry, "pp", [(i, i + 1) for i in range(S - 1)])
            mb_idx = step - rank
            valid = (mb_idx >= 0) & (mb_idx < n_micro)
            safe_mb = jnp.clip(mb_idx, 0, n_micro - 1)
            inp = jnp.where(rank == 0, h_mb[jnp.clip(step, 0, n_micro - 1)],
                            recv)
            boff = safe_mb * b_mb

            def layer_scan(h, xs):
                lw, kk, vv = xs
                kk_b = jax.lax.dynamic_slice_in_dim(kk, boff, b_mb, 0)
                vv_b = jax.lax.dynamic_slice_in_dim(vv, boff, b_mb, 0)
                h, k_l, v_l = _layer(cfg, lw, h, kk_b, vv_b, positions,
                                     pos_start, T, scale, compute_dtype,
                                     tp=tp)
                kk = jnp.where(
                    valid, jax.lax.dynamic_update_slice_in_dim(kk, k_l, boff, 0),
                    kk)
                vv = jnp.where(
                    valid, jax.lax.dynamic_update_slice_in_dim(vv, v_l, boff, 0),
                    vv)
                return h, (kk, vv)

            h, (kv_k, kv_v) = jax.lax.scan(layer_scan, inp,
                                           (stacked, kv_k, kv_v))
            outputs = jnp.where(
                valid & (rank == S - 1),
                jax.lax.dynamic_update_slice(
                    outputs, h[None], (safe_mb, 0, 0, 0)),
                outputs)
            return h, outputs, kv_k, kv_v

        _, outputs, kv_k, kv_v = jax.lax.fori_loop(
            0, n_steps, tick, (carry0, out0, kv_k, kv_v))
        # replicate the last stage's outputs to every rank
        outputs = jax.lax.psum(
            jnp.where(rank == S - 1, outputs, jnp.zeros_like(outputs)), "pp")
        return outputs, kv_k, kv_v

    def wspec(key, leaf):
        # leaf specs inside shard_map: local blocks of the global arrays
        if tp > 1 and key in _COL_KEYS:
            return P("pp", "tp")
        if tp > 1 and key in _ROW_KEYS:
            return P("pp", *([None] * (leaf.ndim - 2)), "tp")
        return P("pp")

    in_layer_specs = {
        key: jax.tree.map(lambda x, k=key: wspec(k, x), val)
        for key, val in pweights["layers_stacked"].items()
    }
    kv_spec = (P("pp", None, None, "tp") if tp > 1
               else P("pp", None, None, None))
    outputs, kv_k, kv_v = jax.shard_map(
        stage_prog, mesh=mesh,
        in_specs=(in_layer_specs, P(), kv_spec, kv_spec),
        out_specs=(P(), kv_spec, kv_spec),
        check_vma=False,
    )(pweights["layers_stacked"], h_mb, kv["k"], kv["v"])

    h = outputs.reshape(B, T, cfg.n_embd)[:, -1, :]
    h = rms_norm(h, pweights["output_norm"], cfg.rms_eps)
    logits = matmul(h, pweights["output"]).astype(jnp.float32)
    return logits, {"k": kv_k, "v": kv_v}
