"""Kernel lab round 4: break the scale-multiply VPU wall (VERDICT r3 #1).

The production nibble kernel applies per-(row, group) scales to the
dequantized weights — N*K VPU multiplies, the measured ~69 us gap between
the unscaled v6 ablation (64.7 us = DMA floor) and production (133.7 us)
on the 28672x4096 gate-up shape.  docs/performance.md's roofline says ~1
multiply/weight caps the family at ~525-530 GB/s.

This lab measures the structural escape: **group-partial contraction**.
Split K into chunks of depth d; inside a chunk, expand the activation into
e = d/32 masked sub-rows (one per 32-group), so ONE MXU dot of depth d
yields the per-group partial sums P[b*e+s, n].  The scale then applies in
the P-domain: N*G*B multiplies instead of N*K — a 32/B reduction.  At
B=1 decode with d=256, the e=8 expansion exactly fills the 8-sublane pad:
the expansion is FREE (the padded rows were dead weight before).

    y[b, n] = sum_g sc[n, g] * P[b, g, n],   P = per-group partial dots

Exact w.r.t. the production semantics (same f32 scale application, just
reassociated per group — the dot order within a group is unchanged).

Variants (shape defaults: gate-up 28672x4096, gs=32):
  n0        production nibble math                       [reference point]
  cp_dD     chunked bf16 partials, chunk depth D (B=1: D=256 -> e=8 rows)
  cp8_dD    chunked int8 partials: weights unpacked to i8 (NO bf16 cast),
            activations int8 (per-group quantized outside), int8 MXU dots
            -> int32 P, scales (incl. activation scale) fold in the
            P-domain.  This is also the reference's own contraction
            (ggml-cpu-quants.c vec_dot_q4_K_q8_K): measuring attack 1(b).
  i8full    full-K int8 dot diagnostic (no group structure): the int8 MXU
            rate ceiling on this runtime.
  scT layout: scales ride TRANSPOSED [G, n2] so per-chunk rows slice on
  sublanes (lane-aligned [e, bn] multiplier slices).

Honest chain timing per docs/performance.md.
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


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
    print(f"{label:44s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def nibble_kernel(reps, x_ref, q_ref, s_ref, o_ref):
    """Production math (lab4 n0): interleaved layout, per-weight scales."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    half = x.shape[1] // 2
    xl, xh = x[:, :half], x[:, half:]
    pu = q_ref[:]
    lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
    hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    o_ref[:] = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xh, hi * sc, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))


def chunk_kernel(K, depth, e, rows, int8, x_ref, q_ref, s_ref, o_ref):
    """Group-partial chunked contraction.

    x_ref  [rows, K]  expanded activation (rows = B*e sub-rows, padded to
           a multiple of 8): row b*e+s holds x[b, k] masked to subgroup s
           of each chunk (bf16, or int8 pre-quantized per 32-group with
           the scale folded into s-multipliers outside).
    q_ref  [bn, K//2] packed nibbles in ORIGINAL column order: byte j =
           col j (lo) | col j+K/2 (hi).
    s_ref  [GE, bn]   P-domain multipliers, TRANSPOSED: row g holds the
           combined scale for group g of every output column (for int8:
           weight scale * activation group scale, b-dependent rows).
    """
    import jax
    import jax.numpy as jnp

    bn = o_ref.shape[1]
    half = K // 2
    nch = K // depth
    ch_half = half // depth  # chunks fully inside the lo half
    acc = jnp.zeros((rows, bn), jnp.float32)
    for c in range(nch):
        if c < ch_half:
            w = (q_ref[:, c * depth:(c + 1) * depth] & 15)
        else:
            cc = c - ch_half
            w = (q_ref[:, cc * depth:(cc + 1) * depth].astype(jnp.int32)
                 >> 4)
        if int8:
            w = w.astype(jnp.int8)
            p = jax.lax.dot_general(
                x_ref[:, c * depth:(c + 1) * depth], w,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            w = w.astype(jnp.int8).astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                x_ref[:, c * depth:(c + 1) * depth], w,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        # P-domain scale: rows c*e..c*e+e of the transposed scale plane
        # (tiled over B when rows > e)
        m = s_ref[c * e:(c + 1) * e, :]
        if rows > e:
            from jax.experimental.pallas import tpu as pltpu

            m = pltpu.repeat(m, rows // e, axis=0)
        acc = acc + p * m
    # fold the e sub-rows of each batch row (B = rows//e output rows)
    B = rows // e
    y = acc.reshape(B, e, bn).sum(axis=1)
    if B < o_ref.shape[0]:
        y = jnp.pad(y, ((0, o_ref.shape[0] - B), (0, 0)))
    o_ref[:] = y


def i8full_kernel(x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp

    y = jax.lax.dot_general(x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[:] = y.astype(jnp.float32)


def run_chunk(mode, B, n2, K, bn, depth, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    G = K // gs
    e = depth // gs
    rows = max(8, B * e)
    int8 = mode.startswith("cp8")
    label = f"{mode} d={depth} n={n2} K={K} bn={bn} B={B}"
    fq = rng.integers(0, 256, size=(n2, K // 2), dtype=np.uint8)
    scT = (rng.random((G, n2), np.float32) * 2e-3 + 1e-4)
    # expanded activation: row (b, s) masks x to subgroup s of each chunk
    x = rng.normal(size=(B, K))
    kidx = np.arange(K)
    sub = (kidx // gs) % e
    X4 = np.zeros((rows, K), np.float32)
    for b in range(B):
        for s in range(e):
            X4[b * e + s] = x[b] * (sub == s)
    if int8:
        # per-32-group symmetric int8 activation quant; the group scale
        # folds into scT rows outside the kernel (B=1) — for B>1 the
        # fold is per-b (scT tiling handles the b-independent part; the
        # b-dependent activation scale would ride a [rows, 1] column —
        # modeled here by folding into X4's s-multiplier cost shape)
        gmax = np.abs(x.reshape(B, G, gs)).max(axis=2) + 1e-8
        x8 = np.clip(np.round(x.reshape(B, G, gs) / gmax[:, :, None] * 127),
                     -127, 127).astype(np.int8).reshape(B, K)
        X4i = np.zeros((rows, K), np.int8)
        for b in range(B):
            for s in range(e):
                X4i[b * e + s] = x8[b] * (sub == s)
        x_dev = jnp.asarray(X4i)
        xdt = jnp.int8
    else:
        x_dev = jnp.asarray(X4, jnp.bfloat16)
        xdt = jnp.bfloat16
    kern = functools.partial(chunk_kernel, K, depth, e, rows, int8)
    try:
        call = pl.pallas_call(
            kern, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((rows, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, bn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((max(8, B), bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(8, B), n2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        wq = jnp.asarray(fq)
        sp = jnp.asarray(scT, jnp.float32)
        nbytes = n2 * K // 2 + n2 * G * 4

        def f(xx):
            y = call(xx, wq, sp)
            return (xx + (y[:1, :1] * 1e-6).astype(xdt)).astype(xdt)

        timed_chain(jax.jit(f), x_dev, label, nbytes)
    except Exception as ex:  # noqa: BLE001 — lab tool
        print(f"{label:44s} FAILED: {type(ex).__name__}: {str(ex)[:160]}",
              flush=True)


def run_n0(B, n2, K, bn, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    G = K // gs
    fq = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)
    call = pl.pallas_call(
        functools.partial(nibble_kernel, (K // 2) // G),
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

    timed_chain(jax.jit(f), x0, f"n0 n={n2} K={K} bn={bn} B={B}",
                n2 * K // 2 + n2 * G * 2)


def run_i8full(B, n2, K, bn, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    G = K // gs
    wq = jnp.asarray(rng.integers(-8, 8, (n2, K)).astype(np.int8))
    sp = jnp.asarray(rng.random((G, n2), np.float32), jnp.float32)
    B8 = max(8, B)
    try:
        call = pl.pallas_call(
            i8full_kernel, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B8, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, bn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B8, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B8, n2), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        x0 = jnp.asarray(rng.integers(-4, 4, (B8, K)).astype(np.int8))

        def f(x):
            y = call(x, wq, sp)
            return (x + (y[:1, :1] // 1000000).astype(jnp.int8)).astype(
                jnp.int8)

        timed_chain(jax.jit(f), x0,
                    f"i8full n={n2} K={K} bn={bn} B={B}", n2 * K)
    except Exception as ex:  # noqa: BLE001
        print(f"i8full FAILED: {type(ex).__name__}: {str(ex)[:160]}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["n0", "cp", "cp8", "i8full"])
    ap.add_argument("--n", type=int, default=28672)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, nargs="+", default=[1024])
    ap.add_argument("--depth", type=int, nargs="+", default=[256])
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    n2 = -(-args.n // 512) * 512
    for bn in args.bn:
        for mode in args.modes:
            if mode == "n0":
                run_n0(max(8, args.batch), n2, args.k, bn)
            elif mode == "i8full":
                run_i8full(args.batch, n2, args.k, bn)
            else:
                for d in args.depth:
                    run_chunk(mode, args.batch, n2, args.k, bn, d)


if __name__ == "__main__":
    main()
