"""Kernel lab round 3: byte-kernel rate investigation + int4-native plane.

Round-2 facts (tools/kernel_lab.py, docs/performance.md): the nibble
kernel is compute-bound at ~1.1 us/Mweight of VPU work (0.55 unpack/cast
+ 0.55 scale-mult); the unscaled ablation streams the 1.02 TB/s DMA
floor.  The BYTE kernel measured 195.6 us on the 28672x4096 shape —
1.67 us/Mw — well above its own compute estimate (cast + mult ~1.1)
AND its DMA time (117 us): it is the one kernel family far from its
roofline.  Variants here:

  b0   production byte math (i8 -> bf16 cast, bf16 mult)      [baseline]
  bf32 i8 -> f32 cast, f32 mult, f32 dot operand
  bu   unscaled byte (diagnostic: isolates cast+dot cost)
  bi16 i8 -> i16 -> bf16 two-step cast
  bx   scales folded per-repetition slice (no repeat tile)
  i4   jnp.int4 plane, single cast + mult (nibble replacement:
       0.5 B/w like packed u8 but Mosaic-native unpack)
  i4u  int4 unscaled diagnostic
  n0   production nibble (reference point on the same table)
  bn sweeps for the winners.

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
    print(f"{label:40s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def byte_kernel(mode, reps, x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    if mode == "b0":
        w = q_ref[:].astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        y = jax.lax.dot_general(x, w * sc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    elif mode == "bf32":
        w = q_ref[:].astype(jnp.float32)
        sc = pltpu.repeat(s_ref[:], reps, axis=1)
        y = jax.lax.dot_general(x.astype(jnp.float32), w * sc,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    elif mode == "bu":
        w = q_ref[:].astype(jnp.bfloat16)
        y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    elif mode == "bi16":
        w = q_ref[:].astype(jnp.int16).astype(jnp.bfloat16)
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        y = jax.lax.dot_general(x, w * sc, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    elif mode == "bx":
        w = q_ref[:].astype(jnp.bfloat16)
        sc = s_ref[:].astype(jnp.bfloat16)
        G = sc.shape[1]
        ws = jnp.concatenate(
            [w[:, r * G:(r + 1) * G] * sc for r in range(w.shape[1] // G)],
            axis=1)
        y = jax.lax.dot_general(x, ws, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_ref[:] = y


def int4_kernel(mode, reps, x_ref, q_ref, s_ref, o_ref):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    w = q_ref[:].astype(jnp.bfloat16)
    if mode == "i4":
        sc = pltpu.repeat(s_ref[:], reps, axis=1).astype(jnp.bfloat16)
        w = w * sc
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def nibble_kernel(reps, x_ref, q_ref, s_ref, o_ref):
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


def run(mode, B, n2, K, G, bn, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)
    label = f"{mode} n={n2} K={K} bn={bn} B={B}"
    try:
        if mode.startswith("b"):
            wq = jnp.asarray(
                rng.integers(-128, 128, (n2, K)).astype(np.int8))
            kern = functools.partial(byte_kernel, mode, K // G)
            wspec = pl.BlockSpec((bn, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            nbytes = n2 * K + n2 * G * 2
        elif mode.startswith("i4"):
            v8 = rng.integers(-8, 8, (n2, K)).astype(np.int8)
            wq = jax.jit(lambda a: a.astype(jnp.int4))(jnp.asarray(v8))
            jax.block_until_ready(wq)
            kern = functools.partial(int4_kernel, mode, K // G)
            wspec = pl.BlockSpec((bn, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            nbytes = n2 * K // 2 + n2 * G * 2
        else:  # n0
            wq = jnp.asarray(
                rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
            kern = functools.partial(nibble_kernel, (K // 2) // G)
            wspec = pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            nbytes = n2 * K // 2 + n2 * G * 2
        call = pl.pallas_call(
            kern, grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                wspec,
                pl.BlockSpec((bn, G), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
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
            y = call(x, wq, sp)
            return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(
                jnp.bfloat16)

        timed_chain(jax.jit(f), x0, label, nbytes)
    except Exception as e:  # noqa: BLE001
        print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["b0", "bu", "bf32", "bi16", "bx", "i4", "i4u",
                             "n0"])
    ap.add_argument("--n", type=int, default=28672)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bn", type=int, nargs="+", default=[1024])
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    K = args.k
    G = K // 32
    n2 = -(-args.n // 512) * 512
    for bn in args.bn:
        for mode in args.modes:
            if mode == "nfma":
                run_fma(args.batch, n2, K, G, bn)
            else:
                run(mode, args.batch, n2, K, G, bn)




# --- appended r3b: FMA bias-tile variant (candidate to replace the xg
# side-dot: if Mosaic emits FMA for w*sc + fb_til, the affine bias is
# FREE and the group-sum side input disappears) ---

def nibble_fma_kernel(reps, x_ref, q_ref, s_ref, b_ref, o_ref):
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
    fb = pltpu.repeat(b_ref[:], reps, axis=1).astype(jnp.bfloat16)
    o_ref[:] = (jax.lax.dot_general(xl, lo * sc + fb,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xh, hi * sc + fb,
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))


def run_fma(B, n2, K, G, bn):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)
    bp = jnp.asarray(rng.random((n2, G), np.float32) * 1e-3, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    call = pl.pallas_call(
        functools.partial(nibble_fma_kernel, (K // 2) // G),
        grid=(n2 // bn,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
        y = call(x, wq, sp, bp)
        return (y[:, :1] * 1e-6 + x.astype(jnp.float32)).astype(jnp.bfloat16)

    timed_chain(jax.jit(f), x0, f"nfma n={n2} K={K} bn={bn} B={B}",
                n2 * K // 2 + n2 * G * 4)


if __name__ == "__main__":
    main()
