"""Expert-parallel MoE with REAL token routing (all-to-all), not weight
replication.

The reference has no expert distribution at all — MoE is a single-device
`mul_mat_id` (ggml/include/ggml.h:1135; SURVEY §2.10 "Expert parallel:
absent as distribution").  The TPU-native form is GShard-style dispatch
under `shard_map` over an 'ep' mesh axis:

  1. experts shard over 'ep' (each device holds E/ep experts' planes);
  2. tokens shard over 'ep' on the batch dim;
  3. each device builds a capacity-C dispatch tensor for its local
     (token, top-k expert) pairs and `lax.all_to_all` ships the
     activations to the owning devices over ICI;
  4. owners run their local experts (dense over the received capacity
     block — the per-device expert count is E/ep, typically 1-2);
  5. a reverse all-to-all returns expert outputs; the combine einsum
     applies the routing weights.

Collectives are XLA's (all_to_all over ICI); no bespoke wire protocol —
the jax.distributed + GSPMD replacement for ggml-rpc (SURVEY §5.8).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.pack import QTensor


def make_ep_mesh(ep: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert ep <= len(devices)
    return Mesh(np.asarray(devices[:ep]), axis_names=("ep",))


def _ep_fast_ok(v: QTensor, ep: int) -> bool:
    """Fast planes can shard over 'ep' only when the padded feature axis
    IS the stacked expert dim (no tail padding rows) and splits into
    whole-expert blocks — else they drop and the shard runs wire planes."""
    return (v.fq is not None and v.n_pad == v.n and v.n % ep == 0)


def shard_experts_ep(lw: dict, mesh: Mesh) -> dict:
    """Place the stacked expert planes so each 'ep' device holds a
    contiguous block of experts (row-shard over the stacked expert dim);
    router + norms replicate.  Fast planes shard along their own feature
    axis (il: rows; t: lanes) so each owner keeps the Pallas kernel path
    for its experts."""
    ep = mesh.shape["ep"]
    col = NamedSharding(mesh, P("ep", None))
    tcol = NamedSharding(mesh, P(None, "ep"))
    rep = NamedSharding(mesh, P())

    def put(v, sh):
        if isinstance(v, QTensor):
            keep_fast = _ep_fast_ok(v, ep)

            def g(a, fast=False):
                if a is None:
                    return None
                a = jnp.asarray(a)
                if fast:
                    if not keep_fast:
                        return None
                    return jax.device_put(a, tcol if v.fl == "t" else sh)
                ok = a.shape[0] % ep == 0
                return jax.device_put(a, sh if ok and a.ndim == 2 else rep)
            return QTensor(v.cfg, v.n, v.k, g(v.q), g(v.d), g(v.qh),
                           g(v.sc), g(v.dmin), g(v.m), g(v.fq, True),
                           g(v.fs, True), g(v.fb, True), fl=v.fl)
        return jax.device_put(jnp.asarray(v), sh)

    out = dict(lw)
    for key in ("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps"):
        out[key] = put(lw[key], col)
    out["ffn_gate_inp"] = put(lw["ffn_gate_inp"], rep)
    return out


def _local_expert_ffn(cfg, gate, up, down, x, eoh, act_fn):
    """Dense FFN over the received capacity block for each LOCAL expert;
    eoh [N, E_local] one-hot selects which expert serves each row (zero
    rows produce zero output).  E_local is tiny (E/ep), so the loop is a
    short static unroll."""
    n_ff_e = cfg.n_ff_exp or cfg.n_ff
    d = cfg.n_embd
    out = jnp.zeros((x.shape[0], d), jnp.float32)
    e_local = eoh.shape[-1]
    for e in range(e_local):
        w = eoh[:, e:e + 1]
        g = act_fn(_mm(x, gate, e * n_ff_e, n_ff_e))
        u = _mm(x, up, e * n_ff_e, n_ff_e)
        y = _mm((g * u).astype(jnp.float32), down, e * d, d)
        out = out + y * w
    return out


def _mm(x, qt, start, n):
    """Row-sliced quantized matmul on the LOCAL shard of a stacked expert
    tensor (shard_map sees the per-device slice).  The slice carries the
    fast planes (qtensor_rows), so on TPU the per-expert matmul runs the
    production Pallas kernels — wire planes remain the oracle fallback."""
    from ..ops.qmatmul import qmatmul

    if isinstance(qt, QTensor):
        from ..models.llama import qtensor_rows

        return qmatmul(x, qtensor_rows(qt, start, n))
    return x.astype(jnp.float32) @ qt[start:start + n].T


def moe_ffn_ep(cfg, lw, f, mesh: Mesh, capacity: int | None = None):
    """Expert-parallel MoE FFN: f [B, T, d] with B sharded over 'ep'.

    Returns [B, T, d] with the same sharding.  Router follows
    build_moe_ffn (softmax -> top-k -> renorm); dispatch is capacity-
    bounded per (source, destination) device pair — overflow drops (the
    standard Switch/GShard trade; capacity defaults to all local pairs,
    i.e. lossless).
    """
    import functools

    try:
        from jax import shard_map as _sm
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        shard_map = functools.partial(_sme, check_rep=False)

    E, K = cfg.n_expert, cfg.n_expert_used
    ep = mesh.shape["ep"]
    assert E % ep == 0, f"n_expert {E} % ep {ep}"
    e_local = E // ep
    act = {"gelu": jax.nn.gelu, "relu": jax.nn.relu}.get(
        cfg.act, lambda v: v * jax.nn.sigmoid(v))

    def body(gate_inp, gate_e, up_e, down_e, f_loc):
        Bl, T, d = f_loc.shape
        npairs = Bl * T * K
        C = capacity or npairs  # per-destination capacity
        router = (f_loc.astype(jnp.float32).reshape(-1, d)
                  @ gate_inp.T.astype(jnp.float32))  # [N, E]
        probs = jax.nn.softmax(router, axis=-1)
        topv, topi = jax.lax.top_k(probs, K)
        if cfg.norm_topk_prob:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        ids = topi.reshape(npairs)              # global expert id per pair
        wts = topv.reshape(npairs)
        xp = jnp.repeat(f_loc.reshape(-1, d), K, axis=0)  # [npairs, d]
        dest = ids // e_local                    # owning device
        # position of each pair within its destination's capacity block
        doh = jax.nn.one_hot(dest, ep, dtype=jnp.int32)   # [npairs, ep]
        pos = jnp.cumsum(doh, axis=0) * doh - 1           # [npairs, ep]
        pos_in = jnp.sum(pos * doh, axis=1)               # [npairs]
        keep = (pos_in >= 0) & (pos_in < C)
        # dispatch [npairs, ep, C]
        disp = (jax.nn.one_hot(dest, ep, dtype=jnp.float32)[:, :, None]
                * jax.nn.one_hot(jnp.where(keep, pos_in, 0), C,
                                 dtype=jnp.float32)[:, None, :]
                * keep[:, None, None].astype(jnp.float32))
        x_send = jnp.einsum("pd,pec->ecd", xp.astype(jnp.float32), disp)
        # local-expert one-hot rides along the same dispatch
        eoh_send = jnp.einsum("pl,pec->ecl",
                              jax.nn.one_hot(ids % e_local, e_local,
                                             dtype=jnp.float32), disp)
        # ship activations to expert owners (ICI all-to-all)
        x_recv = jax.lax.all_to_all(x_send, "ep", 0, 0, tiled=False)
        eoh_recv = jax.lax.all_to_all(eoh_send, "ep", 0, 0, tiled=False)
        y = _local_expert_ffn(
            cfg, gate_e, up_e, down_e,
            x_recv.reshape(ep * C, d).astype(jnp.bfloat16),
            eoh_recv.reshape(ep * C, e_local), act)
        # return trip + weighted combine
        y_back = jax.lax.all_to_all(y.reshape(ep, C, d), "ep", 0, 0,
                                    tiled=False)
        out = jnp.einsum("ecd,pec->pd", y_back, disp) * wts[:, None]
        return jnp.sum(out.reshape(Bl * T, K, d), axis=1).reshape(Bl, T, d)

    # QTensor is a registered pytree: per-tensor spec trees (tp_fast.
    # _qt_specs) shard every wire plane over the stacked expert dim AND
    # the fast planes along their own feature axis (il: rows, t: lanes),
    # so each device's shard_map body sees only ITS experts' packed bytes
    # and keeps the Pallas kernel path — quantized weights never
    # replicate and never move; only activations ride the all-to-all.
    from .tp_fast import _qt_specs

    def local(qt):
        if isinstance(qt, QTensor) and not _ep_fast_ok(qt, ep):
            # fast planes that can't split into whole-expert blocks drop
            # (fl rides along so a t-layout stack is never mislabeled —
            # r4 advisor finding); wire planes remain the shard payload
            return QTensor(qt.cfg, qt.n, qt.k, qt.q, qt.d, qt.qh, qt.sc,
                           qt.dmin, qt.m, fl=qt.fl)
        return qt

    def espec(qt):
        if isinstance(qt, QTensor):
            return _qt_specs(qt, "col", "ep")
        return P("ep", None)

    exps = [local(lw["ffn_gate_exps"]), local(lw["ffn_up_exps"]),
            local(lw["ffn_down_exps"])]
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), espec(exps[0]), espec(exps[1]), espec(exps[2]),
                  P("ep", None, None)),
        out_specs=P("ep", None, None),
    )
    gate_inp = lw["ffn_gate_inp"]
    if isinstance(gate_inp, QTensor):
        from ..ops.qmatmul import dequantize_jax

        gate_inp = dequantize_jax(gate_inp, jnp.float32)

    return fn(jnp.asarray(gate_inp), *exps, f)
