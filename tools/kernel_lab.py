"""Kernel lab: measure nibble-dequant GEMV variants on the real chip.

Goal (VERDICT round-1 item 1): push the Q4-family fast kernel from the
measured ~420-477 GB/s toward the 591 GB/s byte ceiling / 819 GB/s HBM
roofline.  The current kernel's VPU work per packed byte:

    lo: (u8 & 15) -> i8 -> bf16                       (mask + cast)
    hi: u8 -> i32 -> (>> 4) -> bf16                   (wide-int detour)
    sc: pltpu.repeat + 2 bf16 mults

Variants measured here (Mosaic rejects u8->bf16; all casts go via i8):
  v0  current production kernel math
  v7  xor-8 hi packing: plane stores (hi^8)<<4 | lo, so
      i8_bitcast(pu & 0xF0) == 16*hi - 128 exactly — mask + i8->bf16 only;
      the /16 rides on the activation half, the +128 correction folds into
      the group-sum side dot (all outside the streaming loop)
  v3  int4-native plane: fq stored as jnp.int4 [n, K], single dot
  v4  byte kernel (int8 plane) — the current byte-format ceiling
  v8  byte kernel with an int8 MXU dot (scales applied to the output:
      diagnostic for an all-integer path)
  v5  dense bf16 dot — the HBM roofline
  v6  unscaled nibble (diagnostic: isolates the scale-mult cost)

Honest timing: dependent chain of jitted dispatches closed by a data fetch
(tools/qmm_bench.py protocol).
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
    """On-device dependent loop: ONE dispatch runs n_chain chained calls
    (host/tunnel dispatch excluded by construction); RTT from an n=1 loop,
    best-of-5.  Per-call error < a few us."""
    import functools as ft

    import jax

    def loop(n, x):
        return jax.lax.fori_loop(0, n, lambda i, xx: f(xx), x)

    g1 = jax.jit(ft.partial(loop, 1))
    gN = jax.jit(ft.partial(loop, n_chain))
    float(np.asarray(g1(x0)).reshape(-1)[0])  # compile + warm
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


def make_planes(rng, n, K, gs=32):
    G = K // gs
    n2 = -(-n // 512) * 512
    fq = rng.integers(0, 256, size=(n2, K // 2), dtype=np.uint8)
    fs = (rng.random((n2, G), np.float32) * 2e-3 + 1e-4)
    return fq, fs


def nibble_kernel(mode: str, reps: int, x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    half = x.shape[1] // 2
    xl, xh = x[:, :half], x[:, half:]
    pu = q_ref[:]
    if mode == "v0":  # current production math
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        y = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi * sc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
    elif mode == "v7":  # xor-8 hi packing: mask + bitcast + cast only
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = pltpu.bitcast(pu & 0xF0, jnp.int8).astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        # xh arrives pre-divided by 16; the +128 group-sum correction is
        # accounted outside (side dot) — omitted here, identical cost shape
        y = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi * sc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
    elif mode == "v9":  # slice-mult: no repeat materialization; the scale
        # tile multiplies rep-slices of the packed plane in place
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        sc = s_ref[:].astype(jnp.bfloat16)
        G = sc.shape[1]
        lo2 = jnp.concatenate(
            [lo[:, r * G:(r + 1) * G] * sc for r in range(lo.shape[1] // G)],
            axis=1)
        hi2 = jnp.concatenate(
            [hi[:, r * G:(r + 1) * G] * sc for r in range(hi.shape[1] // G)],
            axis=1)
        y = (jax.lax.dot_general(xl, lo2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi2, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
    elif mode == "v10":  # one dot over the full K (scaled halves concat)
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        w = jnp.concatenate([lo * sc, hi * sc], axis=1)
        y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    elif mode == "v12":  # x-half pre-scaled? diagnostic: scale only lo
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        y = (jax.lax.dot_general(xl, lo * sc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
    elif mode == "v6":  # unscaled (diagnostic)
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = pltpu.bitcast(pu & 0xF0, jnp.int8).astype(jnp.bfloat16)
        y = (jax.lax.dot_general(xl, lo, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
    o_ref[:] = y


def int4_kernel(reps: int, x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    w = q_ref[:].astype(jnp.bfloat16)
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w * sc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def byte_kernel(reps: int, x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    w = q_ref[:].astype(jnp.bfloat16)
    sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w * sc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def int8dot_kernel(reps: int, x_ref, q_ref, s_ref, o_ref):
    """All-integer MXU dot; per-column scales applied to the output would be
    wrong across groups — diagnostic only (cost shape of an int8 MXU path)."""
    import jax
    import jax.numpy as jnp

    y = jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = y.astype(jnp.float32)


def dense_kernel(x_ref, w_ref, o_ref):
    import jax
    import jax.numpy as jnp

    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def run_variant(mode, fq, fs, B, K, G, bn, label):
    try:
        _run_variant(mode, fq, fs, B, K, G, bn, label)
    except Exception as e:  # noqa: BLE001 — lab tool, report and continue
        print(f"{label:46s} FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def _run_variant(mode, fq, fs, B, K, G, bn, label):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n2 = fq.shape[0]
    rng = np.random.default_rng(1)
    xdt = jnp.bfloat16

    if mode == "v5":
        w = jnp.asarray(rng.normal(size=(n2, K)), jnp.bfloat16)
        call = pl.pallas_call(
            dense_kernel, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        )
        nbytes = n2 * K * 2

        def f(x):
            y = call(x, w)
            return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(xdt)
    elif mode in ("v3", "v4", "v8"):
        vals = (fq.astype(np.int8) & 15) - 8
        if mode == "v3":
            # int4 device_put is unimplemented on this backend: convert
            # on-device from the int8 halves
            allv = np.concatenate(
                [vals, (fq.astype(np.int16) >> 4).astype(np.int8) - 8], axis=1)
            wq = jax.jit(lambda a: a.astype(jnp.int4))(jnp.asarray(allv))
            jax.block_until_ready(wq)
            nbytes = n2 * K // 2 + n2 * G * 2
            kern = functools.partial(int4_kernel, K // G)
        else:
            wq = jnp.asarray(vals[:, : K // 2].repeat(2, axis=1))
            nbytes = n2 * K + n2 * G * 2
            kern = functools.partial(
                byte_kernel if mode == "v4" else int8dot_kernel, K // G)
            if mode == "v8":
                xdt = jnp.int8
        sp = jnp.asarray(fs, jnp.bfloat16)
        call = pl.pallas_call(
            kern, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        )

        if mode == "v8":
            def f(x):
                y = call(x, wq, sp)
                return jnp.clip(y[:, :K] // 1024, -100, 100).astype(jnp.int8)
        else:
            def f(x):
                y = call(x, wq, sp)
                return (y[:, :K] * 1e-6 + x.astype(jnp.float32)).astype(xdt)
    else:
        wq = jnp.asarray(fq)
        sp = jnp.asarray(fs, jnp.bfloat16)
        kern = functools.partial(nibble_kernel, mode, (K // 2) // G)
        call = pl.pallas_call(
            kern, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n2), jnp.float32),
        )
        nbytes = n2 * K // 2 + n2 * G * 2

        def f(x):
            y = call(x, wq, sp)
            return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(xdt)

    if mode == "v8":
        x0 = jnp.asarray(rng.integers(-4, 4, (B, K)).astype(np.int8))
    else:
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    timed_chain(jax.jit(f), x0, label, nbytes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["v0", "v7", "v3", "v4", "v8", "v5", "v6"])
    ap.add_argument("--n", type=int, default=28672)  # gate-up fused rows
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, nargs="+", default=[2048])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    K = args.k
    gs = 32
    G = K // gs
    fq, fs = make_planes(rng, args.n, K, gs)
    for bn in args.bn:
        for mode in args.modes:
            run_variant(mode, fq, fs, args.batch, K, G, bn,
                        f"{mode} n={args.n} K={K} bn={bn} B={args.batch}")


if __name__ == "__main__":
    main()
