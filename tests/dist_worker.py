"""Worker process for the multi-process jax.distributed test.

Usage: python dist_worker.py <coordinator> <num_procs> <proc_id>
Each process contributes 2 virtual CPU devices; the global mesh is
dp=<num_procs> x tp=2.  Prints `SUM <replicated scalar>` — every process
must print the same value (GSPMD keeps the reduced logits replicated).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives need the gloo backend where available
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from ggml_hexagon_tpu.parallel import distributed
from ggml_hexagon_tpu.parallel.sharding import (
    shard_kv_cache, shard_llama_weights, shard_tokens)
from ggml_hexagon_tpu.models.llama import forward, init_kv_cache


def tiny_model():
    from ggml_hexagon_tpu.models.llama import LlamaConfig
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.quant.pack import quantize_tensor

    cfg = LlamaConfig(n_vocab=128, n_embd=256, n_layer=2, n_head=4,
                      n_head_kv=2, n_ff=512, n_ctx_train=64)
    rng = np.random.default_rng(0)

    def qt(n, k):
        return quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.05,
            GGMLType.Q8_0).astype_device()

    d = cfg.n_embd
    layers = [{
        "attn_norm": jnp.ones(d, jnp.float32),
        "wq": qt(cfg.n_head * cfg.hd, d), "wk": qt(cfg.n_head_kv * cfg.hd, d),
        "wv": qt(cfg.n_head_kv * cfg.hd, d), "wo": qt(d, cfg.n_head * cfg.hd),
        "ffn_norm": jnp.ones(d, jnp.float32),
        "ffn_gate": qt(cfg.n_ff, d), "ffn_up": qt(cfg.n_ff, d),
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


def main():
    coordinator, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    distributed.init(coordinator=coordinator, num_processes=n_procs,
                     process_id=pid)
    info = distributed.process_info()
    assert info["process_count"] == n_procs, info
    assert info["global_devices"] == 2 * n_procs, info

    mesh = distributed.global_mesh(dp=n_procs, tp=2)
    cfg, weights = tiny_model()
    B = n_procs
    with mesh:
        sw = shard_llama_weights(weights, cfg, mesh)
        kv = shard_kv_cache(init_kv_cache(cfg, B, 16), mesh)
        rng = np.random.default_rng(7)
        tokens = shard_tokens(
            rng.integers(0, cfg.n_vocab, (B, 4)).astype(np.int32), mesh)
        logits, kv = jax.jit(forward, static_argnames=("cfg", "logits_all"))(
            cfg, sw, tokens, kv, jnp.int32(0), logits_all=False)
        total = jnp.sum(logits.astype(jnp.float32))  # replicated scalar
        total = float(jax.device_get(total))
    assert np.isfinite(total)
    print(f"SUM {total:.6f}", flush=True)


if __name__ == "__main__":
    main()
