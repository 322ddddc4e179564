"""On-hardware kernel-vs-oracle conformance sweep (VERDICT r2 item 4).

Runs COMPILED (not interpret-mode) on the real TPU: every production
Pallas kernel family against its jnp oracle at test-backend-ops NMSE
budgets (mul_mat class 5e-4, tests/test-backend-ops.cpp:1982 analog).
The round-2 incident this guards against: an interim bench measured with
attention silently skipped — a numerics gate on the device would have
caught it immediately.  Wired into ci/run.sh under REAL_CHIP=1.

Coverage:
  - qmatmul_fast: one shape per fast-plane family (nibble / byte /
    coded-nibble / LUT / ternary / offset-derived-bias)
  - fused epilogues: normed, residual, act-mul, dual-projection
  - fused_decode_attention: bf16 KV, int8 KV, int4 KV
Exit code != 0 on any failure; prints a per-kernel PASS/FAIL table.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

FAILS = []


def check(name, got, want, budget=5e-4):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    nmse = float(((got - want) ** 2).sum() / max((want ** 2).sum(), 1e-30))
    ok = nmse <= budget
    print(f"{name:42s} nmse={nmse:9.2e}  {'PASS' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        FAILS.append(name)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    import bench as B
    from ggml_hexagon_tpu.quant.formats import GGMLType
    from ggml_hexagon_tpu.ops.qmm_fast import (
        dequantize_fast, qmatmul_fast, qmatmul_fast_act, qmatmul_fast_dual,
        qmatmul_fast_normed, qmatmul_fast_res, supports_dual)

    print(f"devices: {jax.devices()}", flush=True)
    assert jax.default_backend() == "tpu", "conformance sweep needs the TPU"
    rng = np.random.default_rng(7)
    n, k = 512, 1024
    x = jnp.asarray(rng.normal(size=(1, k)) * 0.5, jnp.bfloat16)
    xf = x.astype(jnp.float32)

    fams = [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q5_0, GGMLType.Q6_K,
            GGMLType.Q8_0, GGMLType.Q5_K, GGMLType.Q2_K, GGMLType.Q3_K,
            GGMLType.IQ2_XS, GGMLType.IQ3_XXS, GGMLType.IQ4_NL,
            GGMLType.TQ2_0]
    from ggml_hexagon_tpu.quant.pack import QCONFIGS, quantize_tensor

    for t in fams:
        try:
            cfgq = QCONFIGS[t]
            if cfgq.code_map or cfgq.lut:
                # coded-alphabet / LUT formats need REAL quantization
                # (random plane bytes aren't valid code words)
                w0 = rng.normal(size=(n, k)).astype(np.float32) * 0.1
                qt = quantize_tensor(w0, t).astype_device()
            else:
                qt = B.random_qtensor(rng, n, k, t, fast="host")
                qt = qt.astype_device()
            if qt.fq is None:
                print(f"qmm_fast {t.name:32s} (no fast planes) SKIP",
                      flush=True)
                continue
            w = dequantize_fast(qt)[:n]
            want = xf @ w.T
            got = qmatmul_fast(x, qt)
            check(f"qmm_fast {t.name}", got, want)
        except Exception as e:  # noqa: BLE001
            print(f"qmm_fast {t.name}: ERROR {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            FAILS.append(t.name)

    # --- fused epilogues (Q4_K weight; the production decode config) ---
    eps = 1e-5
    wn = jnp.asarray(rng.normal(size=(k,)) * 0.1 + 1.0, jnp.float32)
    qt4 = B.random_qtensor(rng, n, k, GGMLType.Q4_K, fast="host").astype_device()
    w4 = dequantize_fast(qt4)[:n]

    from ggml_hexagon_tpu.ops.qmm_fast import interleave_perm

    # Q4_K defaults to the transposed qp8 layout: the norm plane is the
    # raw weight, and the decode contract is the q8-activation group-
    # partial contraction — compare against ITS reference (exact) plus a
    # loose sanity check vs the f32 oracle (activation-quant error only)
    wn_il = (wn if qt4.fl == "t"
             else wn[np.asarray(interleave_perm(k, qt4.cfg.gs))])
    inv = jax.lax.rsqrt(jnp.mean(xf * xf) + eps)
    want = (xf * inv * wn) @ w4.T
    got = qmatmul_fast_normed(x, qt4, wn_il, eps)
    check("qmm_fast_normed Q4_K", got, want)
    if qt4.fl == "t":
        from ggml_hexagon_tpu.ops.qmm_qp8 import qp8_ref

        want_t = qp8_ref(xf * inv * wn, qt4)[:, :n]
        check("qp8_normed vs qp8_ref Q4_K", got, want_t, budget=1e-6)
        # prefill (tpf) kernel: exact bf16 contract
        xp = jnp.asarray(rng.normal(size=(64, k)) * 0.5, jnp.bfloat16)
        want_p = xp.astype(jnp.float32) @ w4.T
        check("qp8_prefill Q4_K", qmatmul_fast(xp, qt4), want_p,
              budget=2e-3)

    res = jnp.asarray(rng.normal(size=(1, n)), jnp.float32)
    want = xf @ w4.T + res
    got = qmatmul_fast_res(x, qt4, res)
    check("qmm_fast_res Q4_K", got, want)

    # act-mul epilogue: x2 holds gate++up in qt's interleaved column order
    x2 = jnp.asarray(rng.normal(size=(1, 2 * k)) * 0.5, jnp.bfloat16)
    g, u = x2.astype(jnp.float32)[:, :k], x2.astype(jnp.float32)[:, k:]
    silu = lambda v: v * jax.nn.sigmoid(v)
    gu_il = (silu(g) * u)
    # oracle consumes the interleaved product directly (pre_interleaved)
    from ggml_hexagon_tpu.ops.qmm_fast import uninterleave_cols

    want = (gu_il if qt4.fl == "t"
            else uninterleave_cols(gu_il, qt4.cfg.gs)) @ w4.T + res
    got = qmatmul_fast_act(x2, qt4, "silu", res=res)
    check("qmm_fast_act Q4_K", got, want, budget=2e-3)

    qt4il = B.random_qtensor(rng, n, k, GGMLType.Q4_K,
                             fast="host").astype_device(layout="il")
    w4il = dequantize_fast(qt4il)[:n]
    qt6 = B.random_qtensor(rng, 512, k, GGMLType.Q6_K,
                           fast="host").astype_device()
    if supports_dual(qt4il, qt6):
        w6 = dequantize_fast(qt6)[:512]
        # each side's norm weight pre-interleaved with ITS OWN group
        # geometry (Q6_K gs=16 != Q4_K gs=32 — attach_norm_planes does
        # the same per-tensor)
        wn_il6 = wn[np.asarray(interleave_perm(k, qt6.cfg.gs))]
        wn_il4 = wn[np.asarray(interleave_perm(k, qt4il.cfg.gs))]
        want = jnp.concatenate(
            [(xf * inv * wn) @ w4il.T, (xf * inv * wn) @ w6.T], axis=1)
        got = qmatmul_fast_dual(x, qt4il, qt6, wn_il4, wn_il6, eps)
        check("qmm_fast_dual Q4_K+Q6_K", got, want)

    # --- gathered-expert indirect (MUL_MAT_ID) path on-chip ---
    # VERDICT r4 #7: a conformance row for qp8_matmul_indirect; Q4_K
    # defaults to the t-layout so this exercises the qp8 gathered kernel
    # (ops/qmm_qp8.py _qp8_indirect_call); the il variant is covered by
    # the same call on an il-forced tensor.
    from ggml_hexagon_tpu.ops.qmm_fast import (qmatmul_fast_indirect,
                                               supports_indirect)

    E, npe = 4, 512
    for lay in ("t", "il"):
        qte = B.random_qtensor(rng, E * npe, k, GGMLType.Q4_K,
                               fast="host").astype_device(layout=lay)
        if not supports_indirect(qte, npe):
            print(f"qmm_indirect {lay}-layout Q4_K SKIP", flush=True)
            continue
        ids_np = np.asarray([1, 3], np.int32)
        xi = jnp.asarray(rng.normal(size=(2, k)) * 0.5, jnp.float32)
        we = dequantize_fast(qte)[:E * npe]
        want = jnp.stack(
            [xi[i] @ we[ids_np[i] * npe:(ids_np[i] + 1) * npe].T
             for i in range(2)])
        got = qmatmul_fast_indirect(xi, qte, jnp.asarray(ids_np), npe)
        check(f"qmm_indirect {lay}-layout Q4_K", got, want)

    # --- whole-FFN megakernel vs unfused composition ---
    from ggml_hexagon_tpu.ops.ffn_fused import ffn_fused, supports_ffn_fused
    from ggml_hexagon_tpu.ops.qmm_fast import uninterleave_cols

    D2, NFF2 = 4096, 512
    eps2 = 1e-5
    woq = B.random_qtensor(rng, D2, D2, GGMLType.Q4_K,
                           fast="host").astype_device(layout="il")
    guq = B.random_qtensor(rng, 2 * NFF2, D2, GGMLType.Q4_K,
                           fast="host").astype_device(layout="il")
    dnq = B.random_qtensor(rng, D2, NFF2, GGMLType.Q4_K,
                           fast="host").astype_device(layout="il")
    pdc = np.asarray(interleave_perm(NFF2, dnq.cfg.gs))
    gu_il2 = guq.take_rows(np.concatenate([pdc, NFF2 + pdc]))
    pd2 = np.asarray(interleave_perm(D2, 32))
    wo_p = woq.take_rows(pd2)
    dn_p = dnq.take_rows(pd2)
    wn2 = jnp.asarray(rng.normal(size=(D2,)) * 0.1 + 1.0, jnp.float32)
    attn2 = jnp.asarray(rng.normal(size=(1, D2)) * 0.3, jnp.float32)
    hh = jnp.asarray(rng.normal(size=(1, D2)) * 0.5, jnp.float32)
    if supports_ffn_fused(wo_p, gu_il2, dn_p, D2, NFF2):
        got = ffn_fused(attn2, hh, wo_p, gu_il2, dn_p,
                        wn2[pd2], eps2, out_dtype=jnp.float32)
        h2o = attn2 @ dequantize_fast(woq)[:D2].T + hh
        invo = jax.lax.rsqrt(jnp.mean(h2o * h2o, axis=1, keepdims=True)
                             + eps2)
        xbo = h2o * invo * wn2
        g2o = xbo @ dequantize_fast(guq)[:2 * NFF2].T
        siluo = (g2o[:, :NFF2] * jax.nn.sigmoid(g2o[:, :NFF2])
                 * g2o[:, NFF2:])
        want = siluo @ dequantize_fast(dnq)[:D2].T + h2o
        check("ffn_fused megakernel Q4_K", got, want)

    # --- fused decode attention vs dense oracle ---
    from ggml_hexagon_tpu.ops.basic import RopeParams, rope_freqs
    from ggml_hexagon_tpu.ops.decode_attn import fused_decode_attention

    Hq, Hkv, D, S = 8, 2, 128, 512
    scale = 1.0 / float(np.sqrt(D))
    invf = tuple(np.asarray(
        rope_freqs(RopeParams(n_dims=D, mode="neox"))[0]).tolist())
    qkv = jnp.asarray(rng.normal(size=(2, (Hq + 2 * Hkv) * D)), jnp.float32)
    pos_b = jnp.asarray([300, 37], jnp.int32)

    def attn_oracle(qkv, kcf, vcf, k_sc=None, v_sc=None):
        Bq = qkv.shape[0]
        half = D // 2
        ang = pos_b.astype(jnp.float32)[:, None] * jnp.asarray(invf)[None]
        cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]

        def rot(t):
            t1, t2 = t[..., :half], t[..., half:]
            return jnp.concatenate([t1 * cos - t2 * sin,
                                    t1 * sin + t2 * cos], -1)

        q = rot(qkv[:, :Hq * D].reshape(Bq, Hq, D).astype(jnp.float32))
        kk = rot(qkv[:, Hq * D:(Hq + Hkv) * D].reshape(Bq, Hkv, D)
                 .astype(jnp.float32))
        vv = qkv[:, (Hq + Hkv) * D:].reshape(Bq, Hkv, D).astype(jnp.float32)
        kc = kcf.astype(jnp.float32).reshape(Bq, S, Hkv, D)
        vc = vcf.astype(jnp.float32).reshape(Bq, S, Hkv, D)
        if k_sc is not None:
            kc = kc * k_sc[:, :, None, None]
            vc = vc * v_sc[:, :, None, None]
        rows = jnp.arange(Bq)
        kc = kc.at[rows, pos_b].set(kk)
        vc = vc.at[rows, pos_b].set(vv)
        qg = q.reshape(Bq, Hkv, Hq // Hkv, D)
        s = jnp.einsum("bhgd,bshd->bhgs", qg, kc) * scale
        ok = jnp.arange(S)[None, None, None, :] <= pos_b[:, None, None, None]
        p = jax.nn.softmax(jnp.where(ok, s, -1e30), axis=-1)
        return jnp.einsum("bhgs,bshd->bhgd", p, vc).reshape(Bq, Hq * D)

    kc = jnp.asarray(rng.normal(size=(2, S, Hkv * D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(2, S, Hkv * D)), jnp.bfloat16)
    out, _, _ = fused_decode_attention(qkv, kc, vc, pos_b, invf, Hq=Hq,
                                       Hkv=Hkv, D=D, scale=scale, chunk=256)
    check("fused_decode_attention bf16 KV", out, attn_oracle(qkv, kc, vc),
          budget=2e-4)

    for bits, it in ((8, jnp.int8), (4, jnp.int4)):
        qmax = 127 if bits == 8 else 7
        kd = jnp.asarray(rng.random((2, S)) * 0.02 + 0.001, jnp.float32)
        vd = jnp.asarray(rng.random((2, S)) * 0.02 + 0.001, jnp.float32)
        try:
            kq = jnp.asarray(rng.integers(-qmax, qmax + 1, (2, S, Hkv * D)),
                             it)
            vq = jnp.asarray(rng.integers(-qmax, qmax + 1, (2, S, Hkv * D)),
                             it)
            jax.block_until_ready((kq, vq))
            out, _, _ = fused_decode_attention(
                qkv, kq, vq, pos_b, invf, k_scale=kd, v_scale=vd,
                Hq=Hq, Hkv=Hkv, D=D, scale=scale, chunk=256)
            check(f"fused_decode_attention int{bits} KV", out,
                  attn_oracle(qkv, kq, vq, kd, vd), budget=2e-4)
        except Exception as e:  # noqa: BLE001
            if bits == 4 and ("UNIMPLEMENTED" in str(e)
                              or isinstance(e, RecursionError)):
                # this tunneled runtime cannot materialize int4 arrays at
                # all (device_put/astype -> UNIMPLEMENTED; see the verify
                # skill); the int4 path is conformance-tested in
                # interpret mode (tests/test_decode_attn.py) and works on
                # runtimes with int4 support
                print("fused_decode_attention int4 KV: SKIP "
                      "(runtime lacks int4 arrays)", flush=True)
                continue
            print(f"fused_decode_attention int{bits} KV: ERROR "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)
            FAILS.append(f"attn_int{bits}")

    print(f"\nconformance sweep: {len(FAILS)} failures "
          f"({time.time()-t0:.0f}s)", flush=True)
    if FAILS:
        print("FAILED:", FAILS, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
