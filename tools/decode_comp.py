"""Decode composition: honest per-launch timing of the production 8B
Q4_K_M decode layer (VERDICT r2 item 1: refresh the composition table for
the 4-launch layer before attacking the remaining gap).

Measures each kernel family on its REAL shape via the dependent-chain
protocol (tools/kernel_lab.timed_chain), then compares
32*sum(layer launches) + lm_head against the measured whole-step time —
the difference is XLA glue + dispatch + KV-write + sampler tail.

Run: python tools/decode_comp.py            (on the real chip)
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def timed_chain(f, x0, label, nbytes, n_chain=64, trials=3, consts=()):
    """consts: large operands passed as explicit jit ARGUMENTS — closure-
    captured planes above ~100 MB blow the remote_compile body limit
    (HTTP 413) on the tunneled backend."""
    import functools as ft

    import jax

    def loop(n, x, *cs):
        return jax.lax.fori_loop(0, n, lambda i, xx: f(xx, *cs), x)

    g1 = jax.jit(ft.partial(loop, 1))
    gN = jax.jit(ft.partial(loop, n_chain))
    float(np.asarray(g1(x0, *consts)).reshape(-1)[0])
    float(np.asarray(gN(x0, *consts)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g1(x0, *consts)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0, *consts)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - rtt) / (n_chain - 1), 1e-9)
    gbs = nbytes / per / 1e9 if nbytes else 0.0
    print(f"{label:34s} {per*1e6:9.1f} us  {gbs:7.1f} GB/s", flush=True)
    return per


def plane_bytes(qt):
    b = qt.fq.size * qt.fq.dtype.itemsize + qt.fs.size * 2
    if qt.fb is not None:
        b += qt.fb.size * 2
    return int(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.ops.qmm_fast import (
        interleave_perm, qmatmul_fast, qmatmul_fast_act, qmatmul_fast_dual,
        qmatmul_fast_normed, qmatmul_fast_res)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    d, n_ff, hd, Hq, Hkv = 4096, 14336, 128, 32, 8
    S = args.ctx

    def qt(n, k, t):
        return B.random_qtensor(rng, n, k, t,
                                fast="host").astype_device().without_wire()

    want = lambda name: args.only is None or name in args.only
    eps = 1e-5
    wn_il = jnp.ones((d,), jnp.float32)
    results = {}

    if want("dual"):
        wqk = qt(Hq * hd + Hkv * hd, d, GGMLType.Q4_K)     # 5120 x 4096
        wv = qt(Hkv * hd, d, GGMLType.Q6_K)                # 1024 x 4096
        nb = plane_bytes(wqk) + plane_bytes(wv)
        x0 = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

        def f_dual(x):
            y = qmatmul_fast_dual(x, wqk, wv, wn_il, wn_il, eps)
            return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(jnp.bfloat16)

        results["dual_qkv"] = timed_chain(jax.jit(f_dual), x0,
                                          f"dual qkv (Q4K 5120 + Q6K 1024)", nb)

    if want("attn"):
        from ggml_hexagon_tpu.ops.decode_attn import fused_decode_attention

        kc = jnp.asarray(rng.normal(size=(1, S, Hkv * hd)), jnp.bfloat16)
        vc = jnp.asarray(rng.normal(size=(1, S, Hkv * hd)), jnp.bfloat16)
        invf = jnp.asarray(1.0 / 500000.0 ** (np.arange(hd // 2) / (hd // 2)),
                           jnp.float32)
        qkv0 = jnp.asarray(rng.normal(size=(1, (Hq + 2 * Hkv) * hd)),
                           jnp.float32)
        nb = 2 * S * Hkv * hd * 2  # k+v cache reads

        def f_attn(x):
            out, k_r, v_r = fused_decode_attention(
                x, kc, vc, jnp.int32(S - 2), invf, Hq=Hq, Hkv=Hkv, D=hd,
                scale=1.0 / np.sqrt(hd))
            return x + jnp.pad(out, ((0, 0), (0, x.shape[1] - out.shape[1]))
                               ) * 1e-6 + (k_r[:, :1] + v_r[:, :1]) * 1e-7

        results["attn"] = timed_chain(jax.jit(f_attn), qkv0,
                                      f"fused attn (bf16 KV, S={S})", nb)

        # int8 KV variant
        kq = jnp.asarray(rng.integers(-127, 127, (1, S, Hkv * hd)), jnp.int8)
        kd = jnp.asarray(rng.random((1, S)), jnp.float32) * 0.01

        def f_attn_q(x):
            out, k_r, v_r = fused_decode_attention(
                x, kq, kq, jnp.int32(S - 2), invf, k_scale=kd, v_scale=kd,
                Hq=Hq, Hkv=Hkv, D=hd, scale=1.0 / np.sqrt(hd))
            return x + jnp.pad(out, ((0, 0), (0, x.shape[1] - out.shape[1]))
                               ) * 1e-6 + (k_r[:, :1] + v_r[:, :1]) * 1e-7

        results["attn_q8"] = timed_chain(jax.jit(f_attn_q), qkv0,
                                         f"fused attn (int8 KV, S={S})",
                                         nb // 2)

    if want("wo"):
        wo = qt(d, d, GGMLType.Q4_K)
        x0 = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)
        res = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

        def f_wo(x):
            y = qmatmul_fast_res(x, wo, res)
            return (y[:, :x.shape[1]] * 1e-6 + x.astype(jnp.float32)).astype(
                jnp.bfloat16)

        results["wo_res"] = timed_chain(jax.jit(f_wo), x0,
                                        "wo + residual (Q4K 4096x4096)",
                                        plane_bytes(wo))

    if want("gateup"):
        gu = B.host_concat([B.random_qtensor(rng, n_ff, d, GGMLType.Q4_K,
                                             fast="host") for _ in range(2)])
        perm = interleave_perm(n_ff, 32)
        full = np.concatenate([perm, n_ff + perm])
        gu = gu.astype_device().take_rows(full).without_wire()
        x0 = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

        def f_gu(x):
            y = qmatmul_fast_normed(x, gu, wn_il, eps)
            return (y[:, :x.shape[1]] * 1e-6 + x.astype(jnp.float32)).astype(
                jnp.bfloat16)

        results["gateup"] = timed_chain(jax.jit(f_gu), x0,
                                        "gateup normed (Q4K 28672x4096)",
                                        plane_bytes(gu))

    if want("down"):
        for t, lab in ((GGMLType.Q4_K, "Q4K"), (GGMLType.Q6_K, "Q6K")):
            dn = qt(d, n_ff, t)
            x0 = jnp.asarray(rng.normal(size=(1, 2 * n_ff)), jnp.bfloat16)
            res = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

            def f_dn(x, dn=dn):
                y = qmatmul_fast_act(x, dn, "silu", res=res)
                return (jnp.pad(y * 1e-6, ((0, 0), (0, 2 * n_ff - d)))
                        + x.astype(jnp.float32)).astype(jnp.bfloat16)

            results[f"down_{lab}"] = timed_chain(
                jax.jit(f_dn), x0, f"down+act+res ({lab} 4096x14336)",
                plane_bytes(dn))

    if want("ffn"):
        from ggml_hexagon_tpu.ops.ffn_fused import ffn_fused, supports_ffn_fused

        for t, lab in ((GGMLType.Q4_K, "Q4K"), (GGMLType.Q6_K, "Q6K")):
            wo0 = B.random_qtensor(rng, d, d, GGMLType.Q4_K,
                                   fast="host").astype_device()
            gu0 = B.random_qtensor(rng, 2 * n_ff, d, GGMLType.Q4_K,
                                   fast="host").astype_device()
            dn0 = B.random_qtensor(rng, d, n_ff, t,
                                   fast="host").astype_device()
            pdc = np.asarray(interleave_perm(n_ff, dn0.cfg.gs))
            gu_il = gu0.take_rows(
                np.concatenate([pdc, n_ff + pdc])).without_wire()
            pd = np.asarray(interleave_perm(d, 32))
            wo_p = wo0.take_rows(pd).without_wire()
            dn_p = dn0.take_rows(pd).without_wire()
            assert supports_ffn_fused(wo_p, gu_il, dn_p, d, n_ff)
            nb = (plane_bytes(wo_p) + plane_bytes(gu_il)
                  + plane_bytes(dn_p))
            x0 = jnp.asarray(rng.normal(size=(1, 2 * d)), jnp.float32)

            def f_ffn(x, wo_p=wo_p, gu_il=gu_il, dn_p=dn_p):
                y = ffn_fused(x[:, :d], x[:, d:], wo_p, gu_il, dn_p,
                              wn_il, eps, out_dtype=jnp.float32)
                return jnp.concatenate(
                    [x[:, :d], y * 1e-6 + x[:, d:]], axis=1)

            results[f"ffn_{lab}"] = timed_chain(
                jax.jit(f_ffn), x0,
                f"FFN megakernel (wo+gu+{lab} down)", nb)

    if want("lm_head"):
        out_w = qt(128256, d, GGMLType.Q6_K)
        x0 = jnp.asarray(rng.normal(size=(1, d)), jnp.bfloat16)

        def f_head(x, w):
            y = qmatmul_fast(x, w)
            return (y[:, :x.shape[1]] * 1e-6 + x.astype(jnp.float32)).astype(
                jnp.bfloat16)

        results["lm_head"] = timed_chain(f_head, x0,
                                         "lm_head (Q6K 128256x4096)",
                                         plane_bytes(out_w),
                                         consts=(out_w,))

    # --- summary ---
    per_layer = sum(results.get(k, 0.0) for k in
                    ("dual_qkv", "attn", "wo_res", "gateup", "down_Q4K"))
    if per_layer:
        q6_extra = results.get("down_Q6K", 0.0) - results.get("down_Q4K", 0.0)
        # Q4_K_M: ffn_down is Q6_K on ceil(n_layer/8)=4 early layers (policy)
        proj = 32 * per_layer + 4 * max(q6_extra, 0.0) + results.get(
            "lm_head", 0.0)
        print(f"\nper-layer sum: {per_layer*1e3:.3f} ms", flush=True)
        print(f"projected 32-layer step (kernels only): {proj*1e3:.2f} ms "
              f"-> {1/proj:.1f} t/s upper bound", flush=True)
        print("(measured whole-step from bench.py minus this = XLA glue + "
              "KV write + argmax + dispatch)", flush=True)


if __name__ == "__main__":
    main()
