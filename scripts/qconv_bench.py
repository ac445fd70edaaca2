"""On-chip benchmark: fused Pallas int8 conv kernels vs the XLA int8 chain.

Marginal-chain methodology (tunnel dispatch is ~30-60 ms/call): time chains
of 12 and 36 chained applications (output feeds back as input, defeating
CSE), difference, divide. Also spot-checks kernel-vs-reference parity on
the chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/qconv_bench.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vdtpu.ops.pallas.qconv import (qconv3_flat, ref_qconv3_flat,
                                    resblock_flat)

B = 16  # batch 8 + CFG


def readback(x):
    jax.block_until_ready(x)
    return np.asarray(x.ravel()[0])


def timeit(f, *args, runs=5):
    out = f(*args)
    readback(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = f(*args)
        readback(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_shape(h, w, c, groups=32):
    n = c  # feedback chaining requires n == c
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = (jax.random.normal(ks[0], (B, h, w, c)) * 0.5).astype(jnp.bfloat16)
    gs = (jax.random.normal(ks[1], (c,)) * 0.2 + 1.0).astype(jnp.bfloat16)
    gb = (jax.random.normal(ks[2], (c,)) * 0.1).astype(jnp.bfloat16)
    wq = jax.random.randint(ks[3], (3, 3, c, n), -127, 128,
                            jnp.int32).astype(jnp.int8)
    s_w = (jax.random.uniform(ks[4], (n,)) * 2e-3 + 1e-4).astype(jnp.float32)
    bias = (jax.random.normal(ks[5], (n,)) * 0.1).astype(jnp.bfloat16)
    s_act = jnp.float32(0.06)
    av = (jax.random.normal(ks[6], (B, n)) * 0.1).astype(jnp.bfloat16)
    gs2 = (jax.random.normal(ks[7], (n,)) * 0.1 + 1.0).astype(jnp.bfloat16)
    gb2 = (jax.random.normal(ks[8], (n,)) * 0.1).astype(jnp.bfloat16)
    w2q = jax.random.randint(ks[9], (3, 3, n, n), -127, 128,
                             jnp.int32).astype(jnp.int8)

    def fused_once(xf):
        return qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w,
                           add_vec=av)

    def block_once(xf):
        return resblock_flat(xf, (gs, gb), wq, s_w, bias, s_act, av,
                             (gs2, gb2), w2q, s_w, bias, s_act, h, w)

    def xla_once(x4):
        """The production XLA path for one conv site (quant.QConv int8
        with jnp GN+SiLU prologue, static scale, fused adds)."""
        from jax import lax
        from vdtpu.ops.pallas.gn_silu import _ref_gn_silu
        shape = x4.shape
        hh = _ref_gn_silu(x4.reshape(shape[0], -1, shape[-1]), gs, gb, 32,
                          1e-5, True).reshape(shape)
        xq = jnp.clip(jnp.round(hh.astype(jnp.float32) / s_act),
                      -127, 127).astype(jnp.int8)
        dims = lax.conv_dimension_numbers(x4.shape, wq.shape,
                                          ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(xq, wq, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dims,
                                     preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_act * s_w.reshape(1, 1, 1, -1))
        y = y + bias.astype(jnp.float32) \
            + av.astype(jnp.float32)[:, None, None, :]
        return y.astype(jnp.bfloat16)

    def chain(k, once):
        def f(a):
            for _ in range(k):
                a = once(a)
            return a
        return jax.jit(f)

    # parity spot-check on chip
    xf = x.reshape(B, h * w, c)
    got = np.asarray(jax.jit(fused_once)(xf).astype(jnp.float32))
    ref = np.asarray(jax.jit(
        lambda xf: ref_qconv3_flat(xf, gs, gb, s_act, wq, s_w, bias, h, w,
                                   add_vec=av))(xf).astype(jnp.float32))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    print(f"[{h}x{w}x{c}] parity rel-max-err {err:.2e}", flush=True)

    for name, once, arg, per in (("fused", fused_once, xf, 1),
                                 ("block", block_once, xf, 2),
                                 ("xla", xla_once, x, 1)):
        t12 = timeit(chain(12, once), arg)
        t36 = timeit(chain(36, once), arg)
        dt = (t36 - t12) / 24 / per
        print(f"[{h}x{w}x{c}] {name}: {dt*1e3:.3f} ms/site "
              f"(chain12 {t12*1e3:.1f} chain36 {t36*1e3:.1f})", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for h, w, c in ((64, 64, 320), (32, 32, 640)):
        bench_shape(h, w, c)
