"""Mini-bench: 8-layer slice of the 8B Q4_K_M decode for fast on-chip
iteration (the full bench.py builds 32 layers through the tunnel, ~20 min).

Reports per-layer decode time; multiply by 32 and add the lm_head to
sanity-project tg128.  Uses the exact production load pipeline.  Honest
timing per docs/performance.md (data-closed chain).
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "q8_0"])
    ap.add_argument("--ab-ffp", action="store_true",
                    help="time BOTH the FFN-megakernel path and the "
                         "3-launch split path in ONE process (device "
                         "state varies ~10%% across runs; same-process "
                         "A/B is the only honest comparison)")
    ap.add_argument("--ab-qp8", action="store_true",
                    help="time the qp8 transposed-plane layout against "
                         "the interleaved layout in ONE process "
                         "(drift-proof evidence of the structural win)")
    ap.add_argument("--ab-hoist", action="store_true",
                    help="time GHT_QP8_HOIST=1 (r5 prologue/expansion "
                         "scratch) against =0 (r4 per-block) in ONE "
                         "process — the env is a trace-time static, so "
                         "each variant jits its own whole-step program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from ggml_hexagon_tpu.models.llama import (LlamaConfig, forward,
                                               init_kv_cache)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # clone of bench.build_8b with fewer layers
    real_build = B.build_8b

    def build(rng):
        cfg, weights = real_build(rng)
        return cfg, weights

    import ggml_hexagon_tpu.models.llama as L

    full_cfg, _ = None, None
    # monkeypatch layer count by building manually
    from dataclasses import replace

    cfg = LlamaConfig(
        n_vocab=128256, n_embd=4096, n_layer=args.layers, n_head=32,
        n_head_kv=8, n_ff=14336, rope_theta=500000.0, n_ctx_train=8192)
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.quant.policy import QuantPolicy

    policy = QuantPolicy("Q4_K_M", 32)
    d = cfg.n_embd

    layers = []
    for il in range(args.layers):
        print(f"  building layer {il}", flush=True)
        t_v = policy.tensor_type(f"blk.{il}.attn_v.weight", (d, d))
        t_dn = policy.tensor_type(f"blk.{il}.ffn_down.weight", (d, cfg.n_ff))
        hq = lambda n, k, t: B.random_qtensor(rng, n, k, t, fast="host")
        gate = hq(cfg.n_ff, d, GGMLType.Q4_K)
        up = hq(cfg.n_ff, d, GGMLType.Q4_K)
        gateup = B.host_concat([gate, up])
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
            lw["wqkv"] = B.host_concat(qkv_parts).astype_device().without_wire()
        else:
            for key, p in zip(("wq", "wk", "wv"), qkv_parts):
                lw[key] = p.astype_device().without_wire()
        lw["w_gateup"] = gateup.astype_device().without_wire()
        layers.append(lw)
    weights = {
        "tok_embd": B.random_qtensor(rng, cfg.n_vocab, d, GGMLType.Q4_K,
                                     fast=False),
        "output_norm": jnp.ones(d, jnp.float32),
        "output": B.random_qtensor(rng, cfg.n_vocab, d,
                                   GGMLType.Q6_K).without_wire(),
        "layers": layers,
    }
    if not args.no_fuse:
        from ggml_hexagon_tpu.models.fuse import fuse_weights, permute_rope_neox
        from ggml_hexagon_tpu.quant.pack import drop_wire_planes

        weights, cfg = permute_rope_neox(weights, cfg)
        weights = fuse_weights(weights, cfg)
        weights = drop_wire_planes(weights)
    l0 = weights["layers"][0]
    print("layer0 keys:", sorted(l0.keys()), flush=True)

    weights_b = None
    label_a, label_b = "default", None
    if args.ab_qp8:
        # rebuild the SAME weights with the interleaved layout (GHT_QP8=0
        # is read at plane-build time); keep both resident — the 8-layer
        # slice fits HBM twice over
        import os as _os

        _os.environ["GHT_QP8"] = "0"
        rng_b = np.random.default_rng(0)
        layers_b = []
        for il in range(args.layers):
            print(f"  building il twin layer {il}", flush=True)
            t_v = policy.tensor_type(f"blk.{il}.attn_v.weight", (d, d))
            t_dn = policy.tensor_type(f"blk.{il}.ffn_down.weight",
                                      (d, cfg.n_ff))
            hq = lambda n, k, t: B.random_qtensor(rng_b, n, k, t,
                                                  fast="host")
            gate = hq(cfg.n_ff, d, GGMLType.Q4_K)
            up = hq(cfg.n_ff, d, GGMLType.Q4_K)
            gateup = B.host_concat([gate, up])
            qkv_parts = [hq(cfg.n_head * cfg.hd, d, GGMLType.Q4_K),
                         hq(cfg.n_head_kv * cfg.hd, d, GGMLType.Q4_K),
                         hq(cfg.n_head_kv * cfg.hd, d, t_v)]
            lw = {
                "attn_norm": jnp.ones(d, jnp.float32),
                "wo": hq(d, cfg.n_head * cfg.hd,
                         GGMLType.Q4_K).astype_device().without_wire(),
                "ffn_norm": jnp.ones(d, jnp.float32),
                "ffn_down": hq(d, cfg.n_ff,
                               t_dn).astype_device().without_wire(),
            }
            if all(p.cfg == qkv_parts[0].cfg for p in qkv_parts):
                lw["wqkv"] = B.host_concat(
                    qkv_parts).astype_device().without_wire()
            else:
                for key, p_ in zip(("wq", "wk", "wv"), qkv_parts):
                    lw[key] = p_.astype_device().without_wire()
            lw["w_gateup"] = gateup.astype_device().without_wire()
            layers_b.append(lw)
        weights_il = {
            "tok_embd": weights["tok_embd"],
            "output_norm": jnp.ones(d, jnp.float32),
            "output": B.random_qtensor(rng_b, cfg.n_vocab, d,
                                       GGMLType.Q6_K).without_wire(),
            "layers": layers_b,
        }
        _os.environ["GHT_QP8"] = "1"
        if not args.no_fuse:
            from ggml_hexagon_tpu.models.fuse import fuse_weights as _fw
            from ggml_hexagon_tpu.models.fuse import \
                permute_rope_neox as _pr
            from ggml_hexagon_tpu.quant.pack import \
                drop_wire_planes as _dw

            weights_il, _cfg2 = _pr(weights_il, cfg)
            weights_il = _fw(weights_il, _cfg2)
            weights_il = _dw(weights_il)
        weights_b = weights_il
        label_a, label_b = "qp8", "interleaved"
    if args.ab_ffp:
        # split-path twin: strip the ffp markers and un-permute wo/down
        from ggml_hexagon_tpu.ops.qmm_fast import interleave_perm

        inv = np.argsort(interleave_perm(cfg.n_embd, 32))
        wb = dict(weights)
        wb["layers"] = []
        for lw in weights["layers"]:
            nl = {k: v for k, v in lw.items() if k != "ffp"}
            if "ffp" in lw:
                nl["wo"] = lw["wo"].take_rows(inv)
                nl["ffn_down"] = lw["ffn_down"].take_rows(inv)
            wb["layers"].append(nl)
        weights_b = wb

    kv = init_kv_cache(cfg, 1, args.ctx,
                       "q8_0" if args.kv == "q8_0" else jnp.bfloat16)
    from functools import partial

    @partial(jax.jit, static_argnames=("tag",), donate_argnames=("kv",))
    def decode_step(weights, kv, tok, pos, tag="a"):
        logits, kv = forward(cfg, weights, tok, kv, pos, logits_all=False)
        return kv, jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], pos + 1

    def sync(x):
        return int(np.asarray(x).reshape(-1)[0])

    tiny = jax.jit(lambda v: v + 1)
    t = tiny(jnp.int32(0)); sync(t)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        t = tiny(t); sync(t)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    def time_variant(w, label, tag="a", env=None):
        nonlocal kv
        import os as _os

        if env is not None:
            _os.environ["GHT_QP8_HOIST"] = env
        tok = jnp.zeros((1, 1), jnp.int32)
        pos = jnp.int32(args.ctx // 2)
        kv, tok, pos = decode_step(w, kv, tok, pos, tag=tag)
        sync(tok)
        best = 1e9
        for trial in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                kv, tok, pos = decode_step(w, kv, tok, pos, tag=tag)
            sync(tok)
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / args.steps
            best = min(best, dt)
            print(f"  {label} trial {trial}: {dt*1e3:.3f} ms/step",
                  flush=True)
        print(f"best {label}: {best*1e3:.3f} ms/step ({args.layers} layers)",
              flush=True)
        return best

    if args.ab_ffp:
        label_a, label_b = "ffp", "split"
    if args.ab_hoist:
        a = time_variant(weights, "hoist=1", tag="h1", env="1")
        b = time_variant(weights, "hoist=0", tag="h0", env="0")
        a2 = time_variant(weights, "hoist=1#2", tag="h1", env="1")
        b2 = time_variant(weights, "hoist=0#2", tag="h0", env="0")
        print(f"A/B: hoist=1 {min(a, a2)*1e3:.3f} vs hoist=0 "
              f"{min(b, b2)*1e3:.3f} ms/step", flush=True)
        return
    a = time_variant(weights, label_a)
    if weights_b is not None:
        b = time_variant(weights_b, label_b, tag="b")
        # interleave a second pass of each to cancel drift
        a2 = time_variant(weights, label_a + "#2")
        b2 = time_variant(weights_b, label_b + "#2")
        print(f"A/B: {label_a} {min(a, a2)*1e3:.3f} vs {label_b} "
              f"{min(b, b2)*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
