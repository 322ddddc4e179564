"""Scaling benchmark harness — decode throughput vs mesh size.

The measurement tool for BASELINE.json's ">= 80% tokens/s scaling
efficiency 1 host -> 2+ hosts" north star.  On real multi-chip hardware run
per-host under jax.distributed (parallel/distributed.py); in this
single-chip environment it exercises the identical sharded program on the
virtual CPU mesh (mechanism validation; absolute numbers are meaningless
on CPU and marked as such).

    python tools/scaling_bench.py --tp 1 2 4 --layers 4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--embd", type=int, default=512)
    ap.add_argument("--ff", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--cpu-virtual", type=int, default=0,
                    help="force N virtual CPU devices (mechanism test)")
    args = ap.parse_args()

    if args.cpu_virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_virtual}"
        )
    import jax
    if args.cpu_virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from ggml_hexagon_tpu.models.llama import LlamaConfig, forward, init_kv_cache
    from ggml_hexagon_tpu.parallel import make_mesh, shard_kv_cache, shard_llama_weights, shard_tokens
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.quant.pack import quantize_tensor

    cfg = LlamaConfig(
        n_vocab=2048, n_embd=args.embd, n_layer=args.layers, n_head=args.heads,
        n_head_kv=args.kv_heads, n_ff=args.ff,
    )
    rng = np.random.default_rng(0)

    def qt(n, k):
        return quantize_tensor(
            rng.normal(size=(n, k)).astype(np.float32) * 0.03, GGMLType.Q4_K
        ).astype_device()

    d = cfg.n_embd
    weights = {
        "tok_embd": jnp.asarray(rng.normal(size=(cfg.n_vocab, d)).astype(np.float32) * 0.03),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": qt(cfg.n_vocab, d),
        "layers": [
            {
                "attn_norm": jnp.ones(d, jnp.float32),
                "wq": qt(cfg.n_head * cfg.hd, d),
                "wk": qt(cfg.n_head_kv * cfg.hd, d),
                "wv": qt(cfg.n_head_kv * cfg.hd, d),
                "wo": qt(d, cfg.n_head * cfg.hd),
                "ffn_norm": jnp.ones(d, jnp.float32),
                "ffn_gate": qt(cfg.n_ff, d),
                "ffn_up": qt(cfg.n_ff, d),
                "ffn_down": qt(d, cfg.n_ff),
            }
            for _ in range(cfg.n_layer)
        ],
    }

    results = []
    for tp in args.tp:
        if tp * args.dp > len(jax.devices()):
            print(f"skip tp={tp}: only {len(jax.devices())} devices", file=sys.stderr)
            continue
        mesh = make_mesh(dp=args.dp, tp=tp)
        with mesh:
            sw = shard_llama_weights(weights, cfg, mesh)
            B = max(1, args.dp)
            kv = shard_kv_cache(init_kv_cache(cfg, B, 256), mesh)
            step = jax.jit(
                partial(forward, cfg), donate_argnames=("kv_cache",),
            )
            tok = shard_tokens(np.full((B, 1), 3, np.int32), mesh)
            logits, kv = step(sw, tok, kv, jnp.int32(0))
            # fetch DATA, not just readiness: through the tunneled TPU
            # backend block_until_ready can return before execution ends
            float(np.asarray(logits).reshape(-1)[0])
            t0 = time.perf_counter()
            for i in range(args.steps):
                logits, kv = step(sw, tok, kv, jnp.int32(i + 1))
            float(np.asarray(logits).reshape(-1)[0])
            dt = (time.perf_counter() - t0) / args.steps
        results.append({"tp": tp, "dp": args.dp, "ms_per_token": round(dt * 1e3, 3),
                        "tokens_per_sec": round(B / dt, 2)})
        print(json.dumps(results[-1]), file=sys.stderr)
    base = results[0]["tokens_per_sec"] if results else 0
    for r in results:
        r["scaling_efficiency"] = round(r["tokens_per_sec"] / base / 1, 4) if base else 0
    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
