"""Per-production-shape (bn, nkj) sweep for the qmm_fast decode GEMV.

Measures the exact kernels bench.py's decode step runs (Llama-3-8B Q4_K_M
tensor shapes and types) across block configurations, with the on-device
dependent-loop timing protocol.  Feeds _pick_blocks' per-shape table.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    import functools as ft

    import jax
    import jax.numpy as jnp

    from bench import random_qtensor
    from ggml_hexagon_tpu.ops import qmm_fast
    from ggml_hexagon_tpu.quant.formats import GGMLType

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shapes", nargs="+", default=None)
    args = ap.parse_args()

    SHAPES = [
        ("wqk   5120x4096  Q4_K", 5120, 4096, GGMLType.Q4_K),
        ("wv    1024x4096  Q6_K", 1024, 4096, GGMLType.Q6_K),
        ("wo    4096x4096  Q4_K", 4096, 4096, GGMLType.Q4_K),
        ("gateup 28672x4096 Q4_K", 28672, 4096, GGMLType.Q4_K),
        ("down  4096x14336 Q4_K", 4096, 14336, GGMLType.Q4_K),
        ("down  4096x14336 Q6_K", 4096, 14336, GGMLType.Q6_K),
        ("head 128256x4096 Q6_K", 128256, 4096, GGMLType.Q6_K),
    ]
    rng = np.random.default_rng(0)
    B = args.batch
    print(f"devices: {jax.devices()}  B={B}", flush=True)

    for label, n, K, qt in SHAPES:
        if args.shapes and not any(s in label for s in args.shapes):
            continue
        t = random_qtensor(rng, n, K, qt, fast="host").astype_device(
            fast=True).without_wire()
        nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                     for a in (t.fq, t.fs, t.fb) if a is not None)
        nibble = qmm_fast._is_nibble(t.cfg)
        gs = t.cfg.gs
        pmax = gs // 2 if nibble else gs
        valid_p = [p for p in range(1, pmax + 1) if pmax % p == 0]
        cols_total = t.fq.shape[1]
        x0 = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
        configs = [(512, 1), (1024, 1), (2048, 1),
                   (512, 4), (512, 8), (1024, 4), (1024, 8)]
        for bn, nkj in configs:
            if bn > t.fq.shape[0] or nkj not in valid_p:
                continue
            cols = cols_total // nkj
            if cols > 4096 or cols % 128:
                continue
            if True:
                orig = qmm_fast._pick_blocks
                qmm_fast._pick_blocks = lambda *a, _b=bn, _p=nkj: (_b, _p)
                try:
                    f = lambda x: (qmm_fast.qmatmul_fast(
                        x, t, out_dtype=jnp.bfloat16)[:, :K] * 1e-6
                        + x).astype(jnp.bfloat16)
                    try:
                        timed(f, x0, f"{label} bn={bn} nkj={nkj}", nbytes)
                    except Exception as e:  # noqa: BLE001
                        print(f"{label} bn={bn} nkj={nkj}: "
                              f"{type(e).__name__} {str(e)[:90]}", flush=True)
                finally:
                    qmm_fast._pick_blocks = orig


def timed(f, x0, label, nbytes, n_chain=48):
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
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = max((best - rtt) / (n_chain - 1), 1e-9)
    print(f"{label:42s} {per*1e6:9.1f} us  {nbytes/per/1e9:7.1f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
