"""Probe Mosaic (Pallas TPU) capabilities needed by the fused int8 conv:

1. s8 x s8 -> i32 dot on the MXU (and its throughput vs XLA int8 matmul)
2. static sublane-offset slice + add (the 9-tap shift-accumulate)
3. scratch writes at static slices (building the shifted im2col slab)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def readback(x):
    jax.block_until_ready(x)
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(fn, *args, runs=20):
    out = fn(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / runs


# ---- 1. int8 matmul ----
def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def probe_int8_mm():
    M, K, N = 4096, 2880, 128
    a = jnp.ones((M, K), jnp.int8)
    b = jnp.ones((K, N), jnp.int8)
    f = jax.jit(lambda a, b: pl.pallas_call(
        mm_kernel,
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                  pl.BlockSpec((K, N), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )(a, b))
    out = f(a, b)
    ok = bool((np.asarray(out) == K).all())
    # marginal-chain measurement (single-call timings are dispatch-bound
    # through the tunnel): time chains of n repeated matmuls, difference.
    def chain(n, mm):
        def f(a, b):
            out = jnp.zeros((M, N), jnp.int32)
            for i in range(n):
                out = out + mm(a, b)
            return out
        return jax.jit(f)

    pmm = lambda a, b: pl.pallas_call(
        mm_kernel,
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                  pl.BlockSpec((K, N), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))(a, b)
    xmm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    for name, mm in (("pallas", pmm), ("xla", xmm)):
        t20 = bench(chain(20, mm), a, b, runs=5)
        t100 = bench(chain(100, mm), a, b, runs=5)
        dt = (t100 - t20) / 80
        print(f"int8 mm {name}: ok={ok} marginal {dt*1e6:.1f} us "
              f"{2*M*K*N/dt/1e12:.1f} TFLOP/s")


# ---- 2. shifted slice-add over sublanes ----
def shift_kernel(x_ref, o_ref, acc):
    M = x_ref.shape[0]
    acc[:] = jnp.zeros_like(acc)
    for o in (-66, -1, 1, 66):
        lo, hi = max(0, -o), M - max(0, o)
        acc[lo:hi, :] += x_ref[lo + o:hi + o, :].astype(jnp.int32)
    o_ref[:] = acc[:]


def probe_shift():
    M, C = 1056, 320
    x = jnp.arange(M * C, dtype=jnp.int32).reshape(M, C) % 7
    f = jax.jit(lambda x: pl.pallas_call(
        shift_kernel,
        in_specs=[pl.BlockSpec((M, C), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32),
        scratch_shapes=[pltpu.VMEM((M, C), jnp.int32)],
    )(x))
    out = np.asarray(f(x))
    ref = np.zeros((M, C), np.int32)
    xn = np.asarray(x)
    for o in (-66, -1, 1, 66):
        lo, hi = max(0, -o), M - max(0, o)
        ref[lo:hi] += xn[lo + o:hi + o]
    print(f"shifted slice-add: ok={bool((out == ref).all())}")


# ---- 3. scratch static-slice writes + s8 store ----
def scratch_kernel(x_ref, o_ref, scr):
    scr[:] = jnp.zeros_like(scr)
    M = x_ref.shape[0]
    scr[2:2 + M, :] = x_ref[:].astype(jnp.int8)
    o_ref[:] = scr[1:1 + M, :]


def probe_scratch():
    M, C = 512, 320
    x = (jnp.arange(M * C, dtype=jnp.int32).reshape(M, C) % 5).astype(jnp.bfloat16)
    f = jax.jit(lambda x: pl.pallas_call(
        scratch_kernel,
        in_specs=[pl.BlockSpec((M, C), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int8),
        scratch_shapes=[pltpu.VMEM((M + 4, C), jnp.int8)],
    )(x))
    out = np.asarray(f(x))
    ref = np.zeros((M, C), np.int8)
    ref[1:] = np.asarray(x).astype(np.int8)[:M - 1]
    print(f"scratch slice-write: ok={bool((out == ref).all())}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, fn in [("int8_mm", probe_int8_mm), ("shift", probe_shift),
                     ("scratch", probe_scratch)]:
        try:
            fn()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
