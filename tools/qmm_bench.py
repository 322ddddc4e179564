"""Honest per-op microbenchmark for the quantized matmul backends.

The tunneled TPU backend's block_until_ready can return before execution
finishes, so every timing here is closed by fetching result DATA, and the
fixed host round-trip is amortized over a dependent chain of N calls
(each call consumes the previous output, so nothing can be elided).

Usage: python tools/qmm_bench.py [--backend xla|pallas|both] [--chain 32]
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
    ap.add_argument("--backend", default="both")
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import random_qtensor
    from ggml_hexagon_tpu.ops.qmatmul import qmatmul
    from ggml_hexagon_tpu.quant.formats import GGMLType

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    N = args.chain

    def timed_chain(f, x0, label, nbytes, flops):
        """Dependent chain of N separate jit dispatches, one data fetch."""
        x = f(x0)
        float(np.asarray(x).reshape(-1)[0])  # warm + compile
        # measure RTT
        t0 = time.perf_counter()
        float(np.asarray(f(x0)).reshape(-1)[0])
        rtt_plus_one = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            x = x0
            t0 = time.perf_counter()
            for _ in range(N):
                x = f(x)
            float(np.asarray(x).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        per = (best - (rtt_plus_one - best / N)) / N if N > 1 else best
        per = max(per, 1e-9)
        print(f"{label:42s} {per*1e6:9.1f} us  "
              f"{nbytes/per/1e9:7.1f} GB/s  {flops/per/1e12:6.2f} TF/s")

    for B in args.batch:
        for qtype, name in ((GGMLType.Q4_K, "Q4_K"), (GGMLType.Q8_0, "Q8_0"),
                            (GGMLType.Q6_K, "Q6_K")):
            n = k = 4096
            qt = random_qtensor(rng, n, k, qtype)
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in (qt.q, qt.d, qt.qh, qt.sc, qt.dmin, qt.m)
                         if a is not None)
            flops = 2 * B * n * k
            x0 = jnp.asarray(rng.normal(size=(B, k)).astype(np.float32),
                             jnp.bfloat16)
            if args.backend in ("xla", "both"):
                f = jax.jit(lambda x, qt=qt: (
                    qmatmul(x, qt, out_dtype=jnp.bfloat16,
                            backend="xla")[:, :k] * 1e-3 + x))
                timed_chain(f, x0, f"B={B} {name} 4096x4096 xla", nbytes, flops)
            if args.backend in ("pallas", "both"):
                f = jax.jit(lambda x, qt=qt: (
                    qmatmul(x, qt, out_dtype=jnp.bfloat16,
                            backend="pallas")[:, :k] * 1e-3 + x))
                timed_chain(f, x0, f"B={B} {name} 4096x4096 pallas", nbytes, flops)
            if args.backend in ("fast", "both"):
                qtf = qt.with_fast_planes()
                if qtf.fq is not None:
                    fb = jax.jit(lambda x, qt=qtf: (
                        qmatmul(x, qt, out_dtype=jnp.bfloat16,
                                backend="fast")[:, :k] * 1e-3 + x))
                    nb2 = (int(np.prod(qtf.fq.shape)) * qtf.fq.dtype.itemsize
                           + int(np.prod(qtf.fs.shape)) * 2
                           + (0 if qtf.fb is None else
                              int(np.prod(qtf.fb.shape)) * 2))
                    timed_chain(fb, x0, f"B={B} {name} 4096x4096 fast",
                                nb2, flops)
        # dense bf16 roofline, same shape
        w = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32),
                        jnp.bfloat16)
        x0 = jnp.asarray(rng.normal(size=(B, 4096)).astype(np.float32),
                         jnp.bfloat16)
        f = jax.jit(lambda x: (x @ w.T) * 1e-3 + x)
        timed_chain(f, x0, f"B={B} bf16 4096x4096 dense", w.size * 2,
                    2 * B * 4096 * 4096)


if __name__ == "__main__":
    main()
