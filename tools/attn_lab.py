"""Bisect the fused decode-attention kernel's fixed cost on the chip.

pos=0 measurements showed ~100+ us even with the chunk loop disabled —
the cost sits in the init/finalize sections or the pallas pipeline setup.
Variants strip parts to localize it.  Timing: long dependent chains
(N=256) with the RTT estimated as a best-of-5 of single calls, so the
per-call error is < 10 us.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Hq, Hkv, D, S = 32, 8, 128, 1024
HD = Hkv * D
W = (Hq + 2 * Hkv) * D
CH = 512
NC = S // CH


def timed(label, g, x0, pos_b, N=256):
    """On-device dependent loop: one dispatch runs N chained kernel calls
    (python/tunnel dispatch cost excluded by construction); RTT measured
    on an N=1 loop, best-of-5."""
    g1 = jax.jit(functools.partial(g, 1))
    gN = jax.jit(functools.partial(g, N))
    float(np.asarray(g1(x0, pos_b)).reshape(-1)[0])  # compile
    float(np.asarray(gN(x0, pos_b)).reshape(-1)[0])
    rtt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(g1(x0, pos_b)).reshape(-1)[0])
        rtt = min(rtt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(gN(x0, pos_b)).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    per = (best - rtt) / (N - 1)
    print(f"{label:46s} {per*1e6:8.1f} us", flush=True)


def wrap(f):
    def g(n, q, p):
        def body(i, qq):
            a = f(qq, p)  # [1, Hq*D]
            return jnp.concatenate(
                [a * 1e-9 + qq[:, : Hq * D], qq[:, Hq * D :]], axis=-1)
        return jax.lax.fori_loop(0, n, body, q)
    return g


def make_variant(mode):
    def kern(pos_ref, qkv_ref, kc_ref, vc_ref, out_ref, qblk_s, acc_s):
        c = pl.program_id(1)
        nc = pl.num_programs(1)
        pos = pos_ref[pl.program_id(0)]

        if mode == "empty":
            @pl.when(c == nc - 1)
            def _():
                out_ref[:] = qkv_ref[:][:, : Hq * D]
            return

        @pl.when(c == 0)
        def _init():
            qkv = qkv_ref[:].astype(jnp.float32)
            if mode in ("reshape", "blockdiag", "rope", "full"):
                q = qkv[0, : Hq * D].reshape(Hq, D)
                if mode in ("rope", "full"):
                    angle = pos.astype(jnp.float32) * jnp.full(
                        (1, D // 2), 1e-3, jnp.float32)
                    cos, sin = jnp.cos(angle), jnp.sin(angle)
                    q = jnp.concatenate(
                        [q[:, : D // 2] * cos - q[:, D // 2 :] * sin,
                         q[:, : D // 2] * sin + q[:, D // 2 :] * cos], axis=1)
                if mode in ("blockdiag", "full"):
                    row = jax.lax.broadcasted_iota(jnp.int32, (Hq, D), 0)
                    G = Hq // Hkv
                    pieces = [jnp.where((row >= h * G) & (row < (h + 1) * G),
                                        q, 0.0) for h in range(Hkv)]
                    qblk_s[:] = jnp.concatenate(pieces, axis=1)
                else:
                    qblk_s[:, :D] = q
            acc_s[:] = jnp.zeros_like(acc_s[:])

        if mode == "chunk" or mode == "full":
            @pl.when(c * CH < pos)
            def _chunk():
                qblk = qblk_s[:]
                kb = kc_ref[0].astype(jnp.float32)
                s = jax.lax.dot_general(qblk, kb, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jnp.exp(s - s.max(axis=-1, keepdims=True))
                acc_s[:] = acc_s[:] + jax.lax.dot_general(
                    p, vc_ref[0].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(c == nc - 1)
        def _final():
            if mode in ("extract", "full"):
                o = acc_s[:]
                G = Hq // Hkv
                parts = [o[h * G : (h + 1) * G, h * D : (h + 1) * D]
                         for h in range(Hkv)]
                out_ref[:] = jnp.concatenate(parts, axis=0).reshape(1, Hq * D)
            else:
                out_ref[:] = acc_s[:, : Hq * D // Hq].reshape(1, -1)[
                    :, : 1].repeat(Hq * D, axis=1) if False else qkv_ref[:][:, : Hq * D]

    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.normal(size=(1, S, HD)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(1, S, HD)), jnp.bfloat16)

    def chunk_idx(b, c, pos_ref):
        last = jnp.maximum((pos_ref[b] + CH - 1) // CH - 1, 0)
        return (b, jnp.minimum(c, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, NC),
        in_specs=[
            pl.BlockSpec((1, W), lambda b, c, pr: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, HD), chunk_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, HD), chunk_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq * D), lambda b, c, pr: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hq, HD), jnp.float32),
            pltpu.VMEM((Hq, HD), jnp.float32),
        ],
    )

    def f(q, p):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, Hq * D), jnp.float32),
        )(p, q, kc, vc)

    return f


def main():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(1, W)), jnp.float32)
    pos = jnp.asarray([700], jnp.int32)
    timed("wrapper floor (no kernel)",
          wrap(lambda q, p: q[:, : Hq * D]), x0, pos)
    for mode in ("empty", "reshape", "rope", "blockdiag", "chunk",
                 "extract", "full"):
        timed(f"variant {mode}", wrap(make_variant(mode)), x0, pos)


if __name__ == "__main__":
    main()
