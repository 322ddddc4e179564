"""Kernel lab 9: TRANSPOSED-plane qp8 family (the v13 design).

lab7 proved the P-domain win (int8 chunk dots, scales on group partials:
N*G multiplies instead of N*K) but with row-major planes [n2, K/2] the
prefill kernel is impossible (per-column scale expansion is a lane
element-repeat Mosaic can't lower — the reason the interleave existed).
lab8's in-kernel activation quant died on a (1,K)->(1,G,32) reshape.

This lab validates the layout that serves BOTH paths from ONE plane set:

  weights TRANSPOSED  fqT [K/2, n2] u8 (nibble: byte row k = orig row k
      lo | orig row k+K/2 hi) or [K, n2] i8 (byte formats, symmetric
      offset folded into the values at pack time)
  scales TRANSPOSED   fsT [G, n2] bf16 (+ fbT [G, n2] for minsb affine)

  decode (qp8t, B<=8): in-kernel per-SEG-lane-segment activation
      quantization via a segmented BUTTERFLY max (roll+select+max — no
      reshape), x8 int8; expansion X4 [B*e, K] by broadcast + iota mask;
      int8 MXU chunk dots of depth d -> int32 partials; scales applied in
      the P-domain: m_c = fsT_c * xs (xs = extracted scalar per segment);
      affine bias via a ones-column MXU dot (s8 = X4_c @ 1).
      SEG=256 == the reference's own q8_K activation granularity
      (ggml-cpu-quants.c vec_dot_q4_K_q8_K).
  prefill (tpf, B large): natural x [B, K]; per chunk, dequantized
      weights w8 * sc_exp where sc_exp is the SUBLANE broadcast-reshape
      [e, bn] -> [e, 1, bn] -> [e, gs, bn] -> [d, bn] (legal: minor dim
      unchanged); canonical dots x_c @ w_scaled.  The interleave — and
      its activation relayout op — disappears.

Modes:
  n0     production interleaved nibble decode math     [same-process ref]
  t8     qp8t decode, full in-kernel (norm-free)        a=affine suffix
  tpf    transposed prefill                             a=affine suffix
  pf0    production-style interleaved prefill           [same-process ref]
Suffix 'b' = byte (int8 values, gs=16 Q6_K-class), e.g. t8b / tpfb.
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

SEG = 256  # activation-quant segment width (lanes) == q8_K granularity


def timed_chain(f, x0, label, nbytes, n_chain=64, trials=3):
    import functools as ft

    import jax

    def loop(n, x):
        return jax.lax.fori_loop(0, n, lambda i, xx: f(xx), x)

    g1 = jax.jit(ft.partial(loop, 1))
    gN = jax.jit(ft.partial(loop, n_chain))
    float(np.asarray(g1(x0)).reshape(-1)[0])
    float(np.asarray(gN(x0)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g1(x0)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - rtt) / (n_chain - 1), 1e-9)
    print(f"{label:46s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def _butterfly_absmax(x, seg):
    """Per-lane max of |x| over its seg-wide lane segment, via a
    segmented butterfly (k <-> k XOR dist stays inside the segment for
    dist < seg).  No reshapes, no gathers."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    m = jnp.abs(x)
    K = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    dist = 1
    while dist < seg:
        lo = pltpu.roll(m, K - dist, axis=len(x.shape) - 1)
        hi = pltpu.roll(m, dist, axis=len(x.shape) - 1)
        other = jnp.where((lane & dist) == 0, lo, hi)
        m = jnp.maximum(m, other)
        dist *= 2
    del K
    return m


def qp8t_kernel(K, depth, B, gs, nibble, affine, off,
                x_ref, q_ref, s_ref, *rest, unscaled=False,
                noprolog=False):
    """Transposed-plane int8 group-partial decode GEMV (B <= 8).

    x_ref [B, K] f32 raw; q_ref [K/2, bn] u8 (nibble) / [K, bn] i8;
    s_ref fsT [G, bn]; [fbT [G, bn] if affine]; out [8, bn]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    e = depth // gs
    rows = B * e
    nch = K // depth
    nseg = K // SEG
    # ---- per-segment symmetric int8 activation quantization ----------
    xf = x_ref[:].astype(jnp.float32)
    if noprolog:
        # ablation: skip butterfly + mask (x cast straight to int8,
        # broadcast without subgroup selects) — bounds the per-grid-block
        # prologue recomputation cost
        amax = xf
        x8 = xf.astype(jnp.int32)
        x8b = jnp.broadcast_to(x8, (rows, K)) if B == 1 else             jnp.broadcast_to(x8.reshape(B, 1, K), (B, e, K)).reshape(
                rows, K)
        X4 = x8b.astype(jnp.int8)
    amax = _butterfly_absmax(xf, SEG)                      # [B, K] per-lane
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    x8 = jnp.round(xf * iscale).astype(jnp.int32)          # [B, K] (i32:
    # the i1 select mask can't relayout to int8 (32,128) tiling — select
    # in the i32 domain, truncate to int8 after)
    # xs scalars: amax[b, s*SEG] / 127 for each segment s
    xs = [[amax[b, s * SEG] * (1.0 / 127.0) for s in range(nseg)]
          for b in range(B)]
    # ---- expansion: row b*e+s keeps weight-subgroup s of each chunk --
    if not noprolog:
        if B == 1:
            x8b = jnp.broadcast_to(x8, (rows, K))
        else:
            x8b = jnp.broadcast_to(
                x8.reshape(B, 1, K), (B, e, K)).reshape(rows, K)
    if not noprolog:
        sub = (jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1) // gs) % e
        rid = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0) % e
        X4 = jnp.where(sub == rid, x8b, 0).astype(jnp.int8)
    ones = jnp.ones((depth, 1), jnp.int8)
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % e
    half = K // 2
    ch_half = half // depth
    acc = jnp.zeros((rows, bn), jnp.float32)
    segs_per_ch = depth // SEG
    for c in range(nch):
        if nibble:
            if c < ch_half:
                w = (q_ref[c * depth:(c + 1) * depth, :] & 15).astype(
                    jnp.int8)
            else:
                cc = c - ch_half
                w = (q_ref[cc * depth:(cc + 1) * depth, :].astype(jnp.int32)
                     >> 4).astype(jnp.int8)
        else:
            w = q_ref[c * depth:(c + 1) * depth, :]
        xc = X4[:, c * depth:(c + 1) * depth]
        p = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # xs_sel [rows, 1]: row b*e+s -> segment (s*gs)//SEG of batch b
        xs_sel = jnp.zeros((rows, 1), jnp.float32)
        for b in range(B):
            for j in range(segs_per_ch):
                seg_rows_lo = j * (SEG // gs)
                seg_rows_hi = (j + 1) * (SEG // gs)
                cond = ((srow >= seg_rows_lo) & (srow < seg_rows_hi)
                        if B == 1 else
                        (srow >= seg_rows_lo) & (srow < seg_rows_hi)
                        & (jax.lax.broadcasted_iota(
                            jnp.int32, (rows, 1), 0) // e == b))
                xs_sel = jnp.where(cond, xs[b][c * segs_per_ch + j], xs_sel)
        m = s_ref[c * e:(c + 1) * e, :].astype(jnp.float32)   # [e, bn]
        if B > 1:
            m = pltpu.repeat(m, B, axis=0)
        if unscaled:
            # ablation: drop the P-domain multiplies AND the xs selects
            # (keeps quant+expansion+unpack+dots) — the structural cost
            # floor of this kernel family
            acc = acc + p.astype(jnp.float32)
        else:
            acc = acc + p.astype(jnp.float32) * (m * xs_sel)
        if affine or off:
            s8 = jax.lax.dot_general(
                xc, ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            if affine:
                fb = b_ref[c * e:(c + 1) * e, :].astype(jnp.float32)
                if B > 1:
                    fb = pltpu.repeat(fb, B, axis=0)
            else:
                fb = off * m
            acc = acc + fb * (s8 * xs_sel)
    y = acc.reshape(B, e, bn).sum(axis=1)
    if B < o_ref.shape[0]:
        y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
    o_ref[:] = y


def tpf_kernel(K, depth, gs, nibble, affine, off,
               x_ref, q_ref, s_ref, *rest):
    """Transposed-plane prefill GEMM: per-chunk sublane scale expansion,
    canonical dots.  x_ref [B, K] bf16."""
    import jax
    import jax.numpy as jnp

    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    B = x_ref.shape[0]
    e = depth // gs
    nch = K // depth
    half = K // 2
    ch_half = half // depth
    acc = jnp.zeros((B, bn), jnp.float32)
    need_xg = affine or off
    mask = None
    if need_xg:
        sub = jax.lax.broadcasted_iota(jnp.int32, (depth, e), 0) // gs
        col = jax.lax.broadcasted_iota(jnp.int32, (depth, e), 1)
        mask = (sub == col).astype(jnp.bfloat16)
    for c in range(nch):
        if nibble:
            if c < ch_half:
                w = (q_ref[c * depth:(c + 1) * depth, :] & 15).astype(
                    jnp.int8)
            else:
                cc = c - ch_half
                w = (q_ref[cc * depth:(cc + 1) * depth, :].astype(jnp.int32)
                     >> 4).astype(jnp.int8)
        else:
            w = q_ref[c * depth:(c + 1) * depth, :]
        sc = s_ref[c * e:(c + 1) * e, :]
        sc_exp = jnp.broadcast_to(
            sc.reshape(e, 1, bn), (e, gs, bn)).reshape(depth, bn)
        wsc = w.astype(jnp.bfloat16) * sc_exp.astype(jnp.bfloat16)
        xc = x_ref[:, c * depth:(c + 1) * depth]
        acc = acc + jax.lax.dot_general(
            xc, wsc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if need_xg:
            xg = jax.lax.dot_general(
                xc, mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [B, e]
            fb = (b_ref[c * e:(c + 1) * e, :] if affine
                  else off * sc).astype(jnp.float32)
            acc = acc + jax.lax.dot_general(
                xg, fb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc


def pf0_kernel(reps, x_ref, q_ref, s_ref, o_ref):
    """Production-style interleaved prefill (lab7 n0 math, B large)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    half = x.shape[1] // 2
    pu = q_ref[:]
    lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
    hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    o_ref[:] = (jax.lax.dot_general(
        x[:, :half], lo * sc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            x[:, half:], hi * sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))


def oracle_qp8t(x, vals, scT, fbT, off, gs):
    """numpy oracle: per-SEG int8 activations, integer group dots,
    scales on partials."""
    B, K = x.shape
    G = K // gs
    nseg = K // SEG
    xseg = x.reshape(B, nseg, SEG)
    amax = np.abs(xseg).max(axis=2)
    iscale = np.where(amax > 0, 127.0 / amax, 0.0)
    xs = amax / 127.0
    x8 = np.round(xseg * iscale[:, :, None]).reshape(B, K)
    vg = vals.T.reshape(vals.shape[1], G, gs)            # [n, G, gs]
    x8g = x8.reshape(B, G, gs)
    P = np.einsum("bgk,ngk->bgn", x8g, vg)
    xs_g = xs[:, (np.arange(G) * gs) // SEG]             # [B, G]
    y = np.einsum("bgn,gn,bg->bn", P, scT, xs_g)
    if fbT is not None or off:
        s8 = x8g.sum(axis=2)
        fb = fbT if fbT is not None else off * scT
        y = y + np.einsum("gn,bg,bg->bn", fb, s8, xs_g)
    return y


def oracle_tpf(x, vals, scT, fbT, off, gs):
    B, K = x.shape
    G = K // gs
    sc = np.repeat(scT, gs, axis=0)                      # [K, n]
    w = vals * sc
    y = x.astype(np.float32) @ w
    if fbT is not None or off:
        fb = fbT if fbT is not None else off * scT
        xg = x.reshape(B, G, gs).sum(axis=2)
        y = y + xg @ fb
    return y


def make_planes(rng, n2, K, gs, nibble, affine, off):
    """-> (vals [K, n2] int, fqT device, scT, fbT)."""
    import jax.numpy as jnp

    G = K // gs
    if nibble:
        raw = rng.integers(0, 16, (K, n2)).astype(np.int8)
        fqT = (raw[:K // 2] | (raw[K // 2:] << 4)).astype(np.uint8)
        vals = raw
        nbytes = n2 * K // 2
    else:
        vals = rng.integers(-32, 32, (K, n2)).astype(np.int8)
        fqT = vals
        nbytes = n2 * K
    scT = (rng.random((G, n2), np.float32) * 2e-3 + 1e-4).astype(np.float32)
    fbT = (rng.random((G, n2), np.float32) * 1e-3).astype(
        np.float32) if affine else None
    nbytes += n2 * G * 2 * (2 if affine else 1)
    return vals, jnp.asarray(fqT), jnp.asarray(scT, jnp.bfloat16), (
        None if fbT is None else jnp.asarray(fbT, jnp.bfloat16)), scT, fbT, \
        nbytes


def run(mode, B, n2, K, bn, depth, check=False, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    byte = mode.endswith("b") or "b_" in mode
    affine = mode.endswith("a")
    nibble = not byte
    core = mode.replace("tpf", "").replace("t8", "")
    unscaled = "u" in core or "v" in core
    noprolog = "v" in core
    gs = 16 if byte else 32
    off = 0.0
    rng = np.random.default_rng(7)
    G = K // gs
    label = f"{mode} d={depth} n={n2} K={K} bn={bn} B={B}"
    vals, fqT, scT_d, fbT_d, scT, fbT, nbytes = make_planes(
        rng, n2, K, gs, nibble, affine, off)
    decode = mode.startswith("t8")
    # mode suffix 'u' = unscaled ablation (t8u)
    rowsdim = K // 2 if nibble else K
    wspec = pl.BlockSpec((rowsdim, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM)
    if decode:
        kern = functools.partial(qp8t_kernel, K, depth, B, gs, nibble,
                                 affine, off, unscaled=unscaled,
                                 noprolog=noprolog)
        B8 = max(8, B)
        xspec = pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
        xdt = jnp.float32
    else:
        kern = functools.partial(tpf_kernel, K, depth, gs, nibble,
                                 affine, off)
        B8 = B
        xspec = pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
        xdt = jnp.bfloat16
        nbytes += B * K * 2 + B * n2 * 4
    in_specs = [xspec, wspec, sspec]
    args = [fqT, scT_d]
    if affine:
        in_specs.append(sspec)
        args.append(fbT_d)
    try:
        call = pl.pallas_call(
            kern, grid=(n2 // bn,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B8, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B8, n2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        if check:
            y = np.asarray(call(x0, *args))[:B]
            xo = np.asarray(x0, np.float32)
            scb = np.asarray(scT_d.astype(jnp.float32))
            fbb = None if fbT_d is None else np.asarray(
                fbT_d.astype(jnp.float32))
            want = (oracle_qp8t(xo, vals, scb, fbb, off, gs) if decode
                    else oracle_tpf(xo, vals, scb, fbb, off, gs))
            err = np.abs(y - want).max() / (np.abs(want).max() + 1e-9)
            tol = 2e-5 if decode else 3e-2  # tpf: bf16 x and bf16 w prods
            print(f"{label:46s} CHECK rel_err={err:.2e} "
                  f"{'OK' if err < tol else 'FAIL'}", flush=True)
            return

        def f(x):
            y = call(x, *args)
            return (x + (y[:1, :1] * 1e-7).astype(xdt)).astype(xdt)

        timed_chain(jax.jit(f), x0, label, nbytes)
    except Exception as ex:  # noqa: BLE001 — lab tool
        import traceback
        print(f"{label:46s} FAILED: {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)
        if check:
            traceback.print_exc()


def run_pf0(B, n2, K, bn, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    G = K // gs
    fq = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)
    call = pl.pallas_call(
        functools.partial(pf0_kernel, (K // 2) // G),
        grid=(n2 // bn,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)

    def f(x):
        y = call(x, fq, sp)
        return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(jnp.bfloat16)

    timed_chain(jax.jit(f), x0, f"pf0 n={n2} K={K} bn={bn} B={B}",
                n2 * K // 2 + n2 * G * 2 + B * K * 2 + B * n2 * 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["t8", "t8a", "t8b", "tpf", "tpfa", "tpfb",
                             "pf0"])
    ap.add_argument("--n", type=int, default=28672)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, nargs="+", default=[1024])
    ap.add_argument("--depth", type=int, nargs="+", default=[512])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--pfbatch", type=int, default=512)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.interpret:
        print(f"devices: {jax.devices()}", flush=True)
    n2 = -(-args.n // 512) * 512
    for bn in args.bn:
        for mode in args.modes:
            if mode == "pf0":
                if not args.check:
                    run_pf0(args.pfbatch, n2, args.k, bn)
                continue
            B = args.batch if mode.startswith("t8") else args.pfbatch
            for d in args.depth:
                run(mode, B, n2, args.k, bn, d,
                    check=args.check, interpret=args.interpret)


if __name__ == "__main__":
    main()
