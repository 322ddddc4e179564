"""Kernel lab r3d: the program-ALTERNATION penalty.

Whole-model decode sits at ~10.7 ms while honest per-kernel chains sum
to ~7; the residual only closes if each in-model launch carries ~15-25us
that single-kernel chains never see.  Hypothesis: chained microbenchmarks
re-run ONE compiled program (no per-launch program reload / descriptor
setup), while the model alternates ~160 distinct programs per step.

Measure: chain(A,A) and chain(B,B) vs chain(A,B) alternating — the
alternation excess per pair IS the switch cost.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    B, K = 8, 4096
    n2 = 4096
    bn = 512

    def make_kernel(variant):
        def kern(x_ref, q_ref, s_ref, o_ref):
            pu = q_ref[:]
            lo = (pu & 15).astype(jnp.int8).astype(jnp.bfloat16)
            hi = (pu.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
            sc = pltpu.repeat(s_ref[:], (K // 2) // (K // 32),
                              axis=1).astype(jnp.bfloat16)
            half = K // 2
            y = (jax.lax.dot_general(
                    x_ref[:, :half], lo * sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(
                    x_ref[:, half:], hi * sc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            if variant:  # trivially different program (forces 2 binaries)
                y = y + 1e-30
            o_ref[:] = y
        return kern

    G = K // 32
    calls = []
    for v in (0, 1):
        calls.append(pl.pallas_call(
            make_kernel(v), grid=(n2 // bn,),
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
        ))
    wq = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    wq2 = jnp.asarray(rng.integers(0, 256, (n2, K // 2)).astype(np.uint8))
    sp = jnp.asarray(rng.random((n2, G), np.float32) * 2e-3, jnp.bfloat16)

    def chain(seq, n_pairs):
        """One jitted program running n_pairs iterations of the 2-launch
        sequence `seq` (each element picks (call_idx, weight))."""
        def f(x):
            for ci, w in seq:
                y = calls[ci](x, w, sp)
                x = (y[:, :K] * 1e-9 + x.astype(jnp.float32)).astype(
                    jnp.bfloat16)
            return x

        def loop(n, x):
            return jax.lax.fori_loop(0, n, lambda i, xx: f(xx), x)

        return jax.jit(functools.partial(loop, n_pairs))

    x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    N = 32

    def time_g(g, label):
        float(np.asarray(g(x0)).reshape(-1)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(g(x0)).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {best*1e3:9.3f} ms", flush=True)
        return best

    g1 = chain([(0, wq), (0, wq)], N)          # same program, same W
    g1b = chain([(0, wq), (0, wq2)], N)        # same program, other W
    g2 = chain([(0, wq), (1, wq2)], N)         # ALTERNATING programs
    rtt_g = jax.jit(lambda x: x + 1)
    float(np.asarray(rtt_g(x0)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(rtt_g(x0)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    a = time_g(g1, f"A,A x{N} (one program, one W)") - rtt
    b = time_g(g1b, f"A,A' x{N} (one program, two W)") - rtt
    c = time_g(g2, f"A,B x{N} (two programs)") - rtt
    per = 2 * N
    print(f"\nper-launch: same {a/per*1e6:.1f} us | sameprog-otherW "
          f"{b/per*1e6:.1f} | altprog {c/per*1e6:.1f} "
          f"-> switch penalty {(c-b)/per*1e6:.1f} us/launch, "
          f"cold-weight penalty {(b-a)/per*1e6:.1f}", flush=True)


if __name__ == "__main__":
    main()
