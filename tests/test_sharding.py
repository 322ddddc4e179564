"""Sharding tests on the 8-device virtual CPU mesh: sharded forward must
produce the same logits as unsharded, and weights must actually distribute."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ggml_hexagon_tpu.models.llama import LlamaConfig, forward, init_kv_cache
from ggml_hexagon_tpu.parallel import (
    make_mesh, shard_kv_cache, shard_llama_weights, shard_tokens,
)
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant.pack import quantize_tensor


def tiny_weights(cfg, qtype=GGMLType.Q8_0, seed=0):
    rng = np.random.default_rng(seed)
    s = 0.05
    def qt(n, k):
        return quantize_tensor(rng.normal(size=(n, k)).astype(np.float32) * s, qtype).astype_device()
    d = cfg.n_embd
    layers = []
    for _ in range(cfg.n_layer):
        layers.append({
            "attn_norm": jnp.ones(d, jnp.float32),
            "wq": qt(cfg.n_head * cfg.hd, d),
            "wk": qt(cfg.n_head_kv * cfg.hd, d),
            "wv": qt(cfg.n_head_kv * cfg.hd, d),
            "wo": qt(d, cfg.n_head * cfg.hd),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "ffn_gate": qt(cfg.n_ff, d),
            "ffn_up": qt(cfg.n_ff, d),
            "ffn_down": qt(d, cfg.n_ff),
        })
    return {
        "tok_embd": jnp.asarray(rng.normal(size=(cfg.n_vocab, d)).astype(np.float32) * s),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(cfg.n_vocab, d),
        "layers": layers,
    }


CFG = LlamaConfig(n_vocab=512, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
                  n_ff=512, n_ctx_train=128)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_forward_matches_unsharded():
    weights = tiny_weights(CFG)
    tokens = np.array([[3, 17, 99, 250]], dtype=np.int32)
    kv = init_kv_cache(CFG, 1, 16)
    ref, _ = forward(CFG, weights, jnp.asarray(tokens), kv, 0, logits_all=True)

    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        sw = shard_llama_weights(weights, CFG, mesh)
        skv = shard_kv_cache(init_kv_cache(CFG, 1, 16), mesh)
        out, _ = jax.jit(forward, static_argnames=("cfg", "logits_all"))(
            CFG, sw, jnp.asarray(tokens), skv, 0, logits_all=True)
    # sharding changes bf16 reduction order; compare at logits scale
    a, b = np.asarray(out), np.asarray(ref)
    scale = np.abs(b).max()
    assert np.abs(a - b).max() < 0.02 * max(scale, 1.0) + 0.02
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.999


def test_weights_actually_sharded():
    mesh = make_mesh(dp=1, tp=4)
    weights = tiny_weights(CFG)
    sw = shard_llama_weights(weights, CFG, mesh)
    q = sw["layers"][0]["ffn_up"].q
    # column-parallel: each device holds n_pad/4 rows
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(q.shape[0] // 4, q.shape[1])}


def test_dp_tp_mesh_decode():
    mesh = make_mesh(dp=2, tp=2)
    weights = tiny_weights(CFG)
    B = 2
    with mesh:
        sw = shard_llama_weights(weights, CFG, mesh)
        skv = shard_kv_cache(init_kv_cache(CFG, B, 16), mesh)
        toks = shard_tokens(np.array([[5, 6], [7, 8]], dtype=np.int32), mesh)
        logits, kv2 = jax.jit(forward, static_argnames=("cfg", "logits_all"))(
            CFG, sw, toks, skv, 0, logits_all=False)
    assert logits.shape == (B, CFG.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_expert_parallel_matches_unsharded():
    """MoE expert stacks sharded over tp (expert parallelism): outputs must
    match the unsharded forward."""
    from ggml_hexagon_tpu.quant.pack import quantize_tensor

    cfg = LlamaConfig(n_vocab=256, n_embd=256, n_layer=1, n_head=4, n_head_kv=2,
                      n_ff=512, n_expert=4, n_expert_used=2)
    rng = np.random.default_rng(7)
    s = 0.05
    def qt(n, k):
        return quantize_tensor(rng.normal(size=(n, k)).astype(np.float32) * s,
                               GGMLType.Q8_0).astype_device()
    d = cfg.n_embd
    weights = {
        "tok_embd": jnp.asarray(rng.normal(size=(256, d)).astype(np.float32) * s),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(256, d),
        "layers": [{
            "attn_norm": jnp.ones(d, jnp.float32),
            "wq": qt(cfg.n_head * cfg.hd, d), "wk": qt(cfg.n_head_kv * cfg.hd, d),
            "wv": qt(cfg.n_head_kv * cfg.hd, d), "wo": qt(d, cfg.n_head * cfg.hd),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "ffn_gate_inp": qt(cfg.n_expert, d),
            "ffn_gate_exps": qt(cfg.n_expert * cfg.n_ff, d),
            "ffn_up_exps": qt(cfg.n_expert * cfg.n_ff, d),
            "ffn_down_exps": qt(cfg.n_expert * d, cfg.n_ff),
        }],
    }
    tokens = np.array([[3, 17, 99]], dtype=np.int32)
    ref, _ = forward(cfg, weights, jnp.asarray(tokens),
                     init_kv_cache(cfg, 1, 8), 0, logits_all=True)
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        sw = shard_llama_weights(weights, cfg, mesh)
        skv = shard_kv_cache(init_kv_cache(cfg, 1, 8), mesh)
        out, _ = jax.jit(forward, static_argnames=("cfg", "logits_all"))(
            cfg, sw, jnp.asarray(tokens), skv, 0, logits_all=True)
    a, b = np.asarray(out), np.asarray(ref)
    assert np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1] > 0.999


def test_seq_parallel_kv_matches_replicated():
    """KV sharded over the sequence axis ('sp'): GSPMD-partitioned
    attention must match the replicated forward bit-for-bit-ish
    (SURVEY §5.7's named distributed piece for the 70B configs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache
    from ggml_hexagon_tpu.parallel import make_sp_mesh, shard_kv_cache_seq
    from __graft_entry__ import _tiny_model

    cfg, weights = _tiny_model(n_head=4, n_head_kv=2, n_embd=256, n_ff=512)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 8)), jnp.int32)
    step = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 1)), jnp.int32)

    kv = init_kv_cache(cfg, 1, 32)
    ref1, kv = forward(cfg, weights, toks, kv, jnp.int32(0))
    ref2, _ = forward(cfg, weights, step, kv, jnp.int32(8))

    mesh = make_sp_mesh(sp=4)
    with mesh:
        skv = shard_kv_cache_seq(init_kv_cache(cfg, 1, 32), mesh)
        f = jax.jit(forward,
                    static_argnames=("cfg", "logits_all", "seq_parallel"))
        got1, skv = f(cfg, weights, toks, skv, jnp.int32(0),
                      seq_parallel=True)
        got2, skv = f(cfg, weights, step, skv, jnp.int32(8),
                      seq_parallel=True)
        jax.block_until_ready(got2)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-2, atol=2e-2)


def test_moe_ep_all_to_all_routing():
    """Expert-parallel MoE with REAL token routing: experts' quantized
    planes shard over 'ep' (each device holds E/ep experts), activations
    ride lax.all_to_all, and the result matches the replicated dense
    build_moe_ffn evaluation."""
    import ggml_hexagon_tpu.models.llama as L
    from ggml_hexagon_tpu.models.llama import LlamaConfig
    from ggml_hexagon_tpu.parallel.moe import (make_ep_mesh, moe_ffn_ep,
                                               shard_experts_ep)
    from ggml_hexagon_tpu.quant import pack as P_
    from ggml_hexagon_tpu.quant.formats import GGMLType

    rng = np.random.default_rng(5)
    d, n_ff_e, E, ep = 256, 256, 8, 4
    cfg = LlamaConfig(n_vocab=64, n_embd=d, n_layer=1, n_head=2,
                      n_head_kv=2, n_ff=n_ff_e, n_expert=E,
                      n_expert_used=2, n_ff_exp=n_ff_e)

    def qt(n, k):
        return P_.quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.1,
            GGMLType.Q8_0).astype_device(fast=False)

    lw = {
        "ffn_gate_inp": jnp.asarray(rng.normal(size=(E, d)) * 0.1,
                                    jnp.float32),
        "ffn_gate_exps": qt(E * n_ff_e, d),
        "ffn_up_exps": qt(E * n_ff_e, d),
        "ffn_down_exps": qt(E * d, n_ff_e),
    }
    B, T = 4, 2  # batch shards over ep
    f = jnp.asarray(rng.normal(size=(B, T, d)) * 0.5, jnp.float32)

    mesh = make_ep_mesh(ep)
    lw_sh = shard_experts_ep(lw, mesh)
    got = np.asarray(moe_ffn_ep(cfg, lw_sh, f, mesh))

    want = np.asarray(L._moe_ffn(cfg, lw, f.astype(jnp.float32),
                                 jnp.float32))
    nm = float(((got - want) ** 2).sum() / (want ** 2).sum())
    assert nm < 5e-4, nm
