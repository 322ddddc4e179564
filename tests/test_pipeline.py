"""Pipeline parallelism: GPipe schedule over a 'pp' mesh axis must match the
single-device forward exactly (same kernels, same math — only the schedule
differs).  Runs on the virtual 8-device CPU mesh from conftest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggml_hexagon_tpu.models.llama import LlamaConfig, forward, init_kv_cache
from ggml_hexagon_tpu.parallel.pipeline import (
    make_pp_mesh, pipeline_forward, shard_pipeline, stack_layers)
from ggml_hexagon_tpu.quant.formats import GGMLType
from ggml_hexagon_tpu.quant.pack import quantize_tensor


def _tiny(n_layer=4, n_embd=256, n_head=4, n_head_kv=2, n_ff=256, n_vocab=97):
    cfg = LlamaConfig(n_vocab=n_vocab, n_embd=n_embd, n_layer=n_layer,
                      n_head=n_head, n_head_kv=n_head_kv, n_ff=n_ff,
                      n_ctx_train=64)
    rng = np.random.default_rng(0)

    def qt(n, k):
        w = rng.normal(size=(n, k)).astype(np.float32) * 0.05
        return quantize_tensor(w, GGMLType.Q8_0).astype_device()

    d = cfg.n_embd
    layers = [{
        "attn_norm": jnp.ones(d, jnp.float32),
        "wq": qt(cfg.n_head * cfg.hd, d),
        "wk": qt(cfg.n_head_kv * cfg.hd, d),
        "wv": qt(cfg.n_head_kv * cfg.hd, d),
        "wo": qt(d, cfg.n_head * cfg.hd),
        "ffn_norm": jnp.ones(d, jnp.float32),
        "ffn_gate": qt(cfg.n_ff, d),
        "ffn_up": qt(cfg.n_ff, d),
        "ffn_down": qt(d, cfg.n_ff),
    } for _ in range(cfg.n_layer)]
    weights = {
        "tok_embd": jnp.asarray(
            rng.normal(size=(cfg.n_vocab, d)).astype(np.float32) * 0.05),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(cfg.n_vocab, d),
        "layers": layers,
    }
    return cfg, weights


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_pipeline_matches_plain_forward():
    cfg, weights = _tiny()
    B, T, S = 4, 6, 16
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)

    ref_logits, ref_kv = forward(cfg, weights, tokens,
                                 init_kv_cache(cfg, B, S), jnp.int32(0))

    mesh = make_pp_mesh(4)
    pw, kv = shard_pipeline(weights, init_kv_cache(cfg, B, S), mesh)
    logits, new_kv = pipeline_forward(cfg, pw, tokens, kv, jnp.int32(0),
                                      mesh, n_micro=2)
    # bf16 reduction-order noise between the two schedules: loose elementwise
    # bound + exact argmax agreement
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.argmax(np.asarray(logits), -1),
                                  np.argmax(np.asarray(ref_logits), -1))
    np.testing.assert_allclose(np.asarray(new_kv["k"]),
                               np.asarray(ref_kv["k"]), rtol=5e-2, atol=5e-2)

    # decode step continues from the pipelined cache
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    logits2, _ = pipeline_forward(cfg, pw, nxt, new_kv, jnp.int32(T), mesh,
                                  n_micro=2)
    ref_nxt = jnp.argmax(ref_logits, axis=-1).astype(jnp.int32)[:, None]
    ref2, _ = forward(cfg, weights, ref_nxt, ref_kv, jnp.int32(T))
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(ref2),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pipeline_microbatch_count_invariance():
    cfg, weights = _tiny(n_layer=8)
    B, T, S = 4, 5, 8
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    mesh = make_pp_mesh(8)
    pw, kv = shard_pipeline(weights, init_kv_cache(cfg, B, S), mesh)
    l1, _ = pipeline_forward(cfg, pw, tokens, kv, jnp.int32(0), mesh,
                             n_micro=1)
    pw2, kv2 = shard_pipeline(weights, init_kv_cache(cfg, B, S), mesh)
    l4, _ = pipeline_forward(cfg, pw2, tokens, kv2, jnp.int32(0), mesh,
                             n_micro=4)
    # b_mb=4 vs b_mb=1 changes matmul reduction shapes -> bf16 noise only
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l4), rtol=5e-2,
                               atol=5e-2)
    np.testing.assert_array_equal(np.argmax(np.asarray(l1), -1),
                                  np.argmax(np.asarray(l4), -1))


def test_stack_layers_shapes():
    cfg, weights = _tiny()
    stacked = stack_layers(weights)
    assert stacked["attn_norm"].shape == (cfg.n_layer, cfg.n_embd)
    assert stacked["wq"].q.shape[0] == cfg.n_layer


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_pipeline_with_tensor_parallel():
    """pp=2 x tp=2: stages pipeline over 'pp' while each stage row/col
    shards its weights over 'tp' (psum-reduced) — must match plain forward."""
    cfg, weights = _tiny(n_layer=4, n_embd=512, n_head=8, n_head_kv=2,
                         n_ff=512)
    B, T, S = 4, 5, 16
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    ref_logits, _ = forward(cfg, weights, tokens, init_kv_cache(cfg, B, S),
                            jnp.int32(0))

    mesh = make_pp_mesh(2, tp=2)
    pw, kv = shard_pipeline(weights, init_kv_cache(cfg, B, S), mesh)
    logits, new_kv = pipeline_forward(cfg, pw, tokens, kv, jnp.int32(0),
                                      mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.argmax(np.asarray(logits), -1),
                                  np.argmax(np.asarray(ref_logits), -1))
    # decode continues through the composed mesh
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    logits2, _ = pipeline_forward(cfg, pw, nxt, new_kv, jnp.int32(T), mesh,
                                  n_micro=2)
    assert np.isfinite(np.asarray(logits2)).all()
