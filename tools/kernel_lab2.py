"""Lab 2: isolate pallas per-call overhead; test i32-word unpack variants."""
import sys, time, functools

sys.path.insert(0, ".")

from ggml_hexagon_tpu.utils.jaxcache import enable as _jc
_jc()
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=100):
    y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), y)
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)

# -- 1: tiny pallas kernel -> fixed overhead ---------------------------------
def tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


xt = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))


@jax.jit
def tiny(x):
    return pl.pallas_call(
        tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


print(f"1 tiny pallas call : {timeit(tiny, xt)*1e6:8.1f}us")

# -- 2: tiny XLA op ----------------------------------------------------------
@jax.jit
def tiny_xla(x):
    return x * 2.0


print(f"2 tiny xla op      : {timeit(tiny_xla, xt)*1e6:8.1f}us")

# -- 3: stream 33MB of u8 with NO math (copy first slice) --------------------
N, K = 4096, 4096
B = 8
q8 = jnp.asarray(rng.integers(0, 255, size=(N, K // 2), dtype=np.uint8))
BN = 512


def copy_kernel(q_ref, o_ref):
    o_ref[:] = q_ref[:, :128]


@jax.jit
def streamcopy(q):
    return pl.pallas_call(
        copy_kernel,
        grid=(N // BN,),
        in_specs=[pl.BlockSpec((BN, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BN, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.uint8),
    )(q)


dt = timeit(streamcopy, q8)
print(f"3 stream u8 8MB    : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")

# -- 3b: same data viewed as int32 -------------------------------------------
q32 = jnp.asarray(np.asarray(q8).view(np.int32))  # [N, K//8]


def copy_kernel32(q_ref, o_ref):
    o_ref[:] = q_ref[:, :128]


@jax.jit
def streamcopy32(q):
    return pl.pallas_call(
        copy_kernel32,
        grid=(N // BN,),
        in_specs=[pl.BlockSpec((BN, K // 8), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BN, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BN, 128), jnp.int32),
    )(q)


dt = timeit(streamcopy32, q32)
print(f"3b stream i32 8MB  : {dt*1e6:8.1f}us  {N*K//2/dt/1e9:7.1f} GB/s")

# -- 4: i32-word unpack + scale + dot (full Q4-style pipeline, fake scales) --
x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
dsc = jnp.asarray(rng.normal(size=(N, K // 32)).astype(np.float32))  # fused d*sc

PANEL = 1024
WPP = PANEL // 8  # i32 words per panel = 128


def v2_kernel(x_ref, q_ref, s_ref, o_ref, w_scr):
    n_panels = K // PANEL
    acc = jnp.zeros((B, BN), jnp.float32)
    xb = x_ref[:].astype(jnp.bfloat16)
    for Pn in range(n_panels):
        wp = q_ref[:, Pn * WPP : (Pn + 1) * WPP]  # [BN, 128] i32
        for s in range(8):
            part = (jax.lax.shift_right_logical(wp, jnp.int32(4 * s)) & 15).astype(jnp.float32)
            # scale: lanes j -> group j//32, 4 groups per part
            ssl = s_ref[:, Pn * 32 + 4 * s : Pn * 32 + 4 * s + 4]  # [BN, 4]
            scale = pltpu.repeat(ssl, 32, axis=1)  # [BN, 128]
            w_scr[:, s * 128 : (s + 1) * 128] = ((part - 8.0) * scale).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            xb[:, Pn * PANEL : (Pn + 1) * PANEL], w_scr[:],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v2(x, q, s):
    return pl.pallas_call(
        v2_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BN, PANEL), jnp.bfloat16)],
    )(x, q, s)


try:
    dt = timeit(v2, x, q32, dsc)
    tot = N * K // 2 + N * K // 32 * 4
    print(f"4 v2 i32-unpack    : {dt*1e6:8.1f}us  {tot/dt/1e9:7.1f} GB/s (weights+scales)")
except Exception as e:
    print("4 FAILED:", type(e).__name__, str(e)[:300])

# -- 5: same but keep everything f32->bf16 mul in bf16 ----------------------
def v3_kernel(x_ref, q_ref, s_ref, o_ref, w_scr):
    n_panels = K // PANEL
    acc = jnp.zeros((B, BN), jnp.float32)
    xb = x_ref[:].astype(jnp.bfloat16)
    for Pn in range(n_panels):
        wp = q_ref[:, Pn * WPP : (Pn + 1) * WPP]
        for s in range(8):
            part = (jax.lax.shift_right_logical(wp, jnp.int32(4 * s)) & 15).astype(jnp.bfloat16)
            ssl = s_ref[:, Pn * 32 + 4 * s : Pn * 32 + 4 * s + 4]
            scale = pltpu.repeat(ssl, 32, axis=1).astype(jnp.bfloat16)
            w_scr[:, s * 128 : (s + 1) * 128] = (part - jnp.bfloat16(8.0)) * scale
        acc = acc + jax.lax.dot_general(
            xb[:, Pn * PANEL : (Pn + 1) * PANEL], w_scr[:],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@jax.jit
def v3(x, q, s):
    return pl.pallas_call(
        v3_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BN, PANEL), jnp.bfloat16)],
    )(x, q, s)


try:
    dt = timeit(v3, x, q32, dsc)
    tot = N * K // 2 + N * K // 32 * 4
    print(f"5 v3 bf16 dequant  : {dt*1e6:8.1f}us  {tot/dt/1e9:7.1f} GB/s")
except Exception as e:
    print("5 FAILED:", type(e).__name__, str(e)[:300])
