"""Measure, don't estimate (VERDICT r4 Missing #6): can a one-hot MXU
grid-decode beat the shift-LUT arithmetic decode for the 256-entry
i-quant codebooks?

The reference's IQ2_XXS wire packs each 8-weight group as an 8-bit GRID
INDEX (iq2xxs_grid, 256 entries x 8 values) + signs.  Our qp8 planes
expand the index to per-element 2-bit magnitude codes at load (3 bpw)
and decode arithmetically (~160 GB/s, 26-38%% of the Q4_K kernel rate).
The alternative keeps wire density: store the index plane (1 bpw) and
reconstruct in-kernel as W8[g, n, j] = onehot(idx[g, n]) @ grid[c, j].
The onehot itself must be built with VPU iota-compares — 256 compares
per 8-weight group (32/weight) — which is the predicted wall.

This lab times three decode-to-int8 variants over the same logical
weight block (no activation dot — decode is the differentiator), each
as a Pallas kernel on the 28672x4096-class IQ2_XXS geometry:
  lut   — production shift-LUT arithmetic decode (2+1-bit code planes)
  oh    — one-hot iota-compare + [*, 256]x[256, 8] MXU grid dot
  ohsub — one-hot with the 256-axis split as 2x16 (two nibble one-hots,
          grid factored grid[c] = f(hi, lo) is NOT exactly factorable —
          measured as an upper bound on structured-onehot savings using
          a rank-1 surrogate; decode values are wrong but the COST is
          the real cost of the structured trick)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    K, N = 4096, 4096  # one lane block of the 28672x4096 shape
    BN = 2048

    # --- variant 1: production-style 2+1-bit code planes + shift LUT ---
    from ggml_hexagon_tpu.ops.qmm_qp8 import _SHIFT_LUTS

    codes = rng.integers(0, 4, (K, N), np.uint8)        # 2-bit magnitude
    signs = rng.integers(0, 2, (K, N), np.uint8)
    plane2 = np.zeros((K // 4, N), np.uint8)            # 2-bit packed
    for s in range(4):
        plane2 |= codes[s * (K // 4):(s + 1) * (K // 4)] << (2 * s)
    # sign plane packed to the SAME [K/4, N] slice geometry as the
    # magnitude plane (bit 2*s of byte row r = sign of slice s, row r) —
    # byte count matches the production 2+1 layout's ratio closely and
    # the per-element decode op count is identical
    plane1 = np.zeros((K // 4, N), np.uint8)
    for s in range(4):
        plane1 |= signs[s * (K // 4):(s + 1) * (K // 4)] << (2 * s)
    p2 = jnp.asarray(plane2)
    p1 = jnp.asarray(plane1)

    def lut_kernel(q2_ref, q1_ref, o_ref):
        acc = jnp.zeros((8, o_ref.shape[1]), jnp.float32)
        for s in range(4):
            c = (q2_ref[:, :].astype(jnp.int32) >> (2 * s)) & 3
            mag = (_SHIFT_LUTS["iq2"] >> (c * 8)) & 0xFF
            sg1 = (q1_ref[:, :].astype(jnp.int32) >> (2 * s)) & 1
            w = (1 - 2 * sg1) * mag
            # fold [K/4, bn] -> [8, bn] cheap reduce to force decode
            acc = acc + w.astype(jnp.float32).reshape(
                8, (K // 32), o_ref.shape[1]).sum(axis=1)
        o_ref[:, :] = acc

    # --- variant 2: index plane + one-hot MXU grid dot ---
    idx = rng.integers(0, 256, (K // 8, N), np.uint8)
    grid = (rng.integers(0, 3, (256, 8)) * 17 + 8).astype(np.int8)
    idxd = jnp.asarray(idx)
    gridd = jnp.asarray(grid)

    # chunk the K/8 group axis via the GRID (an unrolled 64-chunk Python
    # loop never finished Mosaic compilation; in-kernel dynamic_slice is
    # not lowerable) — grid dim 1 walks CH-row index blocks and
    # accumulates into the same output block ("arbitrary" semantics)
    CH = 8

    def oh_kernel(idx_ref, grid_ref, o_ref):
        bn = o_ref.shape[1]
        g = grid_ref[:, :].astype(jnp.bfloat16)         # [256, 8]
        blk = idx_ref[:, :].astype(jnp.int32)           # [CH, bn]
        cc = jax.lax.broadcasted_iota(jnp.int32, (CH, bn, 256), 2)
        oh = (cc == blk[:, :, None]).astype(jnp.bfloat16)
        w8 = jax.lax.dot_general(
            oh.reshape(CH * bn, 256), g,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [CH*bn, 8]
        part = w8.reshape(CH, bn, 8).sum(axis=0).T

        @pl.when(pl.program_id(1) == 0)
        def _init():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        o_ref[:, :] += part

    def timed(fn, args, label, nbytes, n_chain=24):
        def chain(n, x):
            def body(i, xx):
                y = fn(*args)
                return xx + y[:1, :1] * 1e-9
            return jax.lax.fori_loop(0, n, body, x)

        x0 = jnp.zeros((1, 1), jnp.float32)
        g1 = jax.jit(functools.partial(chain, 1))
        gN = jax.jit(functools.partial(chain, n_chain))
        float(np.asarray(g1(x0))[0, 0])
        float(np.asarray(gN(x0))[0, 0])
        rtt = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(np.asarray(g1(x0))[0, 0])
            rtt = min(rtt, time.perf_counter() - t0)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(gN(x0))[0, 0])
            best = min(best, time.perf_counter() - t0)
        per = max((best - rtt) / (n_chain - 1), 1e-9)
        print(f"{label:44s} {per*1e6:9.1f} us  "
              f"{nbytes/per/1e9:7.1f} GB/s-decoded-weights", flush=True)
        return per

    def lut_call():
        return pl.pallas_call(
            lut_kernel,
            grid=(N // BN,),
            in_specs=[pl.BlockSpec((K // 4, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K // 4, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, BN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p2, p1)

    def oh_call():
        return pl.pallas_call(
            oh_kernel,
            grid=(N // BN, (K // 8) // CH),
            in_specs=[pl.BlockSpec((CH, BN), lambda i, c: (c, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((256, 8), lambda i, c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, BN), lambda i, c: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary")),
        )(idxd, gridd)

    wbytes = K * N  # decoded int8 weight bytes per pass
    timed(lut_call, (), "iq2 shift-LUT decode (3 bpw planes)", wbytes)
    timed(oh_call, (), "iq2 one-hot MXU grid decode (1 bpw idx)", wbytes)


if __name__ == "__main__":
    main()
