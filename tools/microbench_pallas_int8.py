"""On-chip experiment: how fast is a bare Pallas int8 matmul (no dequant)?

Separates the w4a8 kernel's cost into (a) the int8 dot at our tiling vs
(b) the in-kernel unpack+requant, by timing a kernel identical to
ops/w4a8_matmul minus the dequant — weights arrive pre-quantized int8.
Compares against the XLA int8 dot (native MXU tiling) across block configs.

Usage: python tools/microbench_pallas_int8.py [M K N [iters]]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, acc_ref):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("bm", "bk", "bn"))
def pallas_int8_matmul(x8, w8, bm=1088, bk=1024, bn=512):
    m, k = x8.shape
    _, n = w8.shape
    pad_m = (-m) % bm
    if pad_m:
        x8 = jnp.pad(x8, ((0, pad_m), (0, 0)))
    mp = x8.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k, bytes_accessed=mp * k + k * n + mp * n * 4,
            transcendentals=0,
        ),
    )(x8, w8)
    return out[:m]


def chain_time(fn, x0, iters):
    def body(x, _):
        y = fn(x)
        return jnp.clip(y[:, : x.shape[1]] >> 7, -127, 127).astype(jnp.int8), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    y = run(x0)
    _ = np.asarray(y[:1, :1])
    t0 = time.perf_counter()
    y = run(x0)
    _ = np.asarray(y[:1, :1])
    return (time.perf_counter() - t0) / iters


def main():
    M, K, N = (int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (4352, 3072, 12288)
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    flops = 2.0 * M * K * N
    rs = np.random.RandomState(0)
    x8 = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)
    w8 = jnp.asarray(rs.randint(-127, 128, (K, N)), jnp.int8)

    t = chain_time(lambda x: jax.lax.dot_general(
        x, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32), x8, iters)
    print(f"XLA int8 dot:                 {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s", flush=True)

    for bm, bk, bn in ((1088, 1024, 512), (1088, 512, 512), (1088, 1024, 1024),
                      (512, 1024, 512), (2176, 1024, 512), (1088, 3072, 512),
                      (4352, 512, 256)):
        if K % bk or N % bn:
            continue
        try:
            t = chain_time(lambda x, b=(bm, bk, bn): pallas_int8_matmul(x, w8, *b), x8, iters)
            print(f"pallas int8 bm={bm:4d} bk={bk:4d} bn={bn:4d}: {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"pallas int8 bm={bm:4d} bk={bk:4d} bn={bn:4d}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
