"""Kernel lab 8: production-candidate int8 group-partial GEMV (full math).

kernel_lab7 proved the structural win (cp8 d=512: 75.6 us vs the
production nibble kernel's 118.7 us on the 28672x4096 gate-up shape —
same process).  This lab adds EVERYTHING the production kernel needs and
checks numerics against a numpy oracle:

  - in-kernel activation quantization: per-32-group absmax -> int8
    (reshape [B, G, 32] minor-dim reduce — viability is one of the
    questions this lab answers)
  - in-kernel expansion X4[b*e+s, k] = x8[b, k] * (subgroup(k) == s)
    via broadcasted_iota masks
  - int8 MXU chunk dots -> int32 partials P
  - P-domain scale stage: acc += P * (scT_slice * xs_slice)  (the
    activation group scale folds here — N*G*B multiplies, not N*K)
  - affine bias (Q4_K dmin class): acc += fbT_slice * (xs_slice * s8_c)
    where s8_c = per-chunk lane-sums of X4 (the reference's bsums)
  - symmetric-offset formats (Q4_0/Q6_K): offset folded into the int8
    values at pack time — no bias machinery at all

Weight layout: ORIGINAL column order (groups contiguous).  Nibble planes
pack byte j = col j | col j+K/2 << 4; chunk slices stay byte-aligned
because d <= K/2.  Scales/bias ride TRANSPOSED [G, n2] so per-chunk rows
slice on sublanes.

Semantics = the reference's own contraction (vec_dot_*_q8_K): activations
per-group int8, integer dots, scales applied to group partials.
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

GS = 32  # quant group size


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
    print(f"{label:52s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def qp8_kernel(K, depth, B, nibble, affine, x_ref, q_ref, s_ref, *rest):
    """B=1 decode GEMV.  x_ref [1, K] f32 raw activation; q_ref packed
    (nibble u8 [bn, K/2] or int8 [bn, K]); s_ref scT [G, bn];
    [fbT [G, bn] if affine]; out [8, bn].

    No jnp.repeat / gathers anywhere: quantization runs on a [1, G, GS]
    3-D view with broadcast division; the expansion is a broadcast +
    iota mask; per-chunk scale columns are contiguous sublane slices of
    ONE prologue-transposed xsT [G, 1]."""
    import jax
    import jax.numpy as jnp

    assert B == 1
    b_ref = rest[0] if affine else None
    o_ref = rest[-1]
    bn = o_ref.shape[1]
    G = K // GS
    e = depth // GS
    assert e >= 8, "qp8 serves depth >= 256"
    rows = e
    nch = K // depth
    # ---- prologue: per-group int8 quantization of the activation -------
    xf3 = x_ref[:].astype(jnp.float32).reshape(1, G, GS)
    amax = jnp.max(jnp.abs(xf3), axis=2, keepdims=True)     # [1, G, 1]
    iscale = jnp.where(amax > 0, 127.0 / amax, 0.0)
    x8 = jnp.round(xf3 * iscale).astype(jnp.int8).reshape(1, K)
    xsT = jnp.transpose((amax[:, :, 0] * (1.0 / 127.0)))    # [G, 1]
    # ---- expansion: row s keeps subgroup s of each chunk ----------------
    sub = (jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1) // GS) % e
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0)
    X4 = jnp.where(sub == rid, jnp.broadcast_to(x8, (rows, K)), 0)
    half = K // 2
    ch_half = half // depth
    acc = jnp.zeros((rows, bn), jnp.float32)
    for c in range(nch):
        if nibble:
            if c < ch_half:
                w = (q_ref[:, c * depth:(c + 1) * depth] & 15).astype(
                    jnp.int8)
            else:
                cc = c - ch_half
                w = (q_ref[:, cc * depth:(cc + 1) * depth].astype(jnp.int32)
                     >> 4).astype(jnp.int8)
        else:
            w = q_ref[:, c * depth:(c + 1) * depth]
        xc = X4[:, c * depth:(c + 1) * depth]
        p = jax.lax.dot_general(xc, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        m = s_ref[c * e:(c + 1) * e, :].astype(jnp.float32)  # [e, bn]
        xs_c = xsT[c * e:(c + 1) * e, :]                     # [e, 1]
        acc = acc + p.astype(jnp.float32) * (m * xs_c)
        if affine:
            s8 = jnp.sum(xc.astype(jnp.float32), axis=1, keepdims=True)
            fb = b_ref[c * e:(c + 1) * e, :].astype(jnp.float32)
            acc = acc + fb * (s8 * xs_c)
    y = jnp.sum(acc, axis=0, keepdims=True)                  # [1, bn]
    o_ref[:] = jnp.broadcast_to(y, (o_ref.shape[0], bn))


def oracle(x, vals, scT, fbT):
    """numpy oracle of the kernel contract: per-32-group q8 activations,
    integer dots, scales on group partials."""
    B, K = x.shape
    G = K // GS
    xb = x.reshape(B, G, GS)
    amax = np.abs(xb).max(axis=2)
    iscale = np.where(amax > 0, 127.0 / amax, 0.0)
    xs = amax / 127.0
    x8 = np.round(xb * iscale[:, :, None])
    # group partials: P[b, g, n] = sum_k x8 * v
    vg = vals.reshape(vals.shape[0], G, GS)             # [n, G, GS]
    P = np.einsum("bgk,ngk->bgn", x8, vg)
    # y = sum_g P * scT[g, n] * xs[b, g]  (+ bias)
    y = np.einsum("bgn,gn,bg->bn", P, scT[:, :vals.shape[0]], xs)
    if fbT is not None:
        s8 = x8.sum(axis=2)                              # [B, G]
        y = y + np.einsum("gn,bg,bg->bn", fbT[:, :vals.shape[0]], s8, xs)
    return y


def run(mode, B, n2, K, bn, depth, check=False, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nibble = mode.startswith("qp8n")
    affine = mode.endswith("a")
    rng = np.random.default_rng(3)
    G = K // GS
    e = depth // GS
    rows = B * e
    label = f"{mode} d={depth} n={n2} K={K} bn={bn} B={B}"
    if nibble:
        vals = rng.integers(0, 16, (n2, K)).astype(np.int8)
        fq = (vals[:, :K // 2] | (vals[:, K // 2:] << 4)).astype(np.uint8)
        wdev = jnp.asarray(fq)
        wspec = pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        nbytes = n2 * K // 2
    else:
        vals = rng.integers(-32, 32, (n2, K)).astype(np.int8)
        wdev = jnp.asarray(vals)
        wspec = pl.BlockSpec((bn, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        nbytes = n2 * K
    scT = (rng.random((G, n2), np.float32) * 2e-3 + 1e-4).astype(np.float32)
    fbT = (rng.random((G, n2), np.float32) * 1e-3).astype(
        np.float32) if affine else None
    nbytes += n2 * G * 4 * (2 if affine else 1)
    kern = functools.partial(qp8_kernel, K, depth, B, nibble, affine)
    B8 = max(8, B)
    in_specs = [
        pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((G, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [wdev, jnp.asarray(scT)]
    if affine:
        in_specs.append(pl.BlockSpec((G, bn), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(fbT))
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
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
        if check:
            y = np.asarray(call(x0, *args))[:B]
            want = oracle(np.asarray(x0), vals, scT, fbT)
            err = np.abs(y - want).max() / (np.abs(want).max() + 1e-9)
            print(f"{label:52s} CHECK rel_err={err:.2e} "
                  f"{'OK' if err < 2e-5 else 'FAIL'}", flush=True)
            return

        def f(x):
            y = call(x, *args)
            return x + y[:1, :1] * 1e-7

        timed_chain(jax.jit(f), x0, label, nbytes)
    except Exception as ex:  # noqa: BLE001 — lab tool
        import traceback
        print(f"{label:52s} FAILED: {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)
        if check:
            traceback.print_exc()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["qp8n", "qp8na", "qp8b"])
    ap.add_argument("--n", type=int, default=28672)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, nargs="+", default=[1024])
    ap.add_argument("--depth", type=int, nargs="+", default=[512])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.interpret:
        print(f"devices: {jax.devices()}", flush=True)
    n2 = -(-args.n // 512) * 512
    for bn in args.bn:
        for mode in args.modes:
            for d in args.depth:
                run(mode, args.batch, n2, args.k, bn, d,
                    check=args.check, interpret=args.interpret)


if __name__ == "__main__":
    main()
