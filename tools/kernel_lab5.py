"""Kernel lab r3c: the wide-K (ffn_down, K=14336) nibble kernel.

In-model it runs bn=512 at ~412 GB/s; bn=1024 measured WORSE (119us vs
64-89) because the unpack intermediates (12 B/packed-col) blow VMEM and
Mosaic spills.  Variant '2slice' unpacks and dots the packed block in two
sequential half-K slices, halving peak intermediates — aiming to make
bn=1024 viable.  Also sweeps prefill shapes (B=512) against the 13 MB
general-loop budget that forces small blocks + K-splits there.
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
    print(f"{label:46s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)
    return per


def nib_kernel(nsl, reps, x_ref, q_ref, s_ref, o_ref):
    """nsl sequential half-slices of the packed block (nsl=1 == v0)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    K = x.shape[1]
    half = K // 2
    cols = q_ref.shape[1]
    csl = cols // nsl
    acc = None
    for s in range(nsl):
        pu = q_ref[:, s * csl:(s + 1) * csl]
        lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
        hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
        scs = pltpu.repeat(s_ref[:], reps, axis=1).astype(
            jnp.bfloat16)[:, s * csl:(s + 1) * csl]
        xl = x[:, s * csl:(s + 1) * csl]
        xh = x[:, half + s * csl: half + (s + 1) * csl]
        y = (jax.lax.dot_general(xl, lo * scs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xh, hi * scs, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        acc = y if acc is None else acc + y
    o_ref[:] = acc


def run(B, n2, K, bn, nsl, gs=32):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = K // gs
    rng = np.random.default_rng(1)
    wq = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)
    label = f"nsl={nsl} n={n2} K={K} bn={bn} B={B}"
    try:
        call = pl.pallas_call(
            functools.partial(nib_kernel, nsl, (K // 2) // G),
            grid=(n2 // bn,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, K // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
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

        timed_chain(jax.jit(f), x0, label, n2 * K // 2 + n2 * G * 2,
                    n_chain=32 if B > 64 else 64)
    except Exception as e:  # noqa: BLE001
        print(f"{label:46s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="down", choices=["down", "prefill"])
    args = ap.parse_args()
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    if args.mode == "down":
        # x interleave re-pairing differs between nsl variants — cost
        # shape only; numerics validated separately in production
        for bn, nsl in ((512, 1), (512, 2), (1024, 2), (1024, 4),
                        (2048, 4), (1024, 1)):
            run(8, 4096, 14336, bn, nsl)
    else:
        # prefill gate-up shape: B=512
        for bn, nsl in ((512, 1), (1024, 1), (1024, 2), (2048, 2),
                        (2048, 4)):
            run(512, 28672, 4096, bn, nsl)


if __name__ == "__main__":
    main()
