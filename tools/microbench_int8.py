"""On-chip microbench: does the int8 path actually run at 2x the bf16 rate?

Times in-graph lax.scan chains (per-dispatch relay latency is ~13 ms on this
box, so op-level timing must amortise inside one program — verify skill):
  1. bf16 x bf16 dot (fp32 accum)            — the baseline MXU rate
  2. int8 x int8 -> int32 dot (plain XLA)    — the w8a8 execution path
  3. Pallas int4 fused-dequant matmul        — current int4 kernel
  4. Pallas w4a8 kernel                      — int4 storage, int8 MXU

Shapes default to the FLUX fc1 GEMM (M=4352 joint tokens, K=3072, N=12288),
the largest single matmul in the step.

Usage: python tools/microbench_int8.py [M K N [iters]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, x0, n):
    def body(x, _):
        return fn(x), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    y = run(x0)
    _ = np.asarray(jax.tree.leaves(y)[0][:1, :1])  # compile+sync
    t0 = time.perf_counter()
    y = run(x0)
    _ = np.asarray(jax.tree.leaves(y)[0][:1, :1])
    return (time.perf_counter() - t0) / n


def main():
    M, K, N = (int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (4352, 3072, 12288)
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    flops = 2.0 * M * K * N
    rs = np.random.RandomState(0)
    print(f"shape M={M} K={K} N={N}  ({flops/1e9:.1f} GFLOP/matmul), {iters} iters")

    # 1. bf16 baseline. Chain must keep M x K shape: y (M,N) -> slice back.
    w_bf = jnp.asarray(rs.randn(K, N) * 0.02, jnp.bfloat16)

    def f_bf16(x):
        y = jnp.dot(x, w_bf, preferred_element_type=jnp.float32)
        return y[:, :K].astype(jnp.bfloat16)

    x0 = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    t = chain(f_bf16, x0, iters)
    print(f"bf16 dot:        {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

    # 2. int8 dot (XLA)
    w8 = jnp.asarray(rs.randint(-127, 128, (K, N)), jnp.int8)

    def f_int8(x8):
        acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.clip(acc[:, :K] >> 7, -127, 127).astype(jnp.int8)

    x8 = jnp.asarray(rs.randint(-127, 128, (M, K)), jnp.int8)
    t = chain(f_int8, x8, iters)
    print(f"int8 dot (XLA):  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TOP/s")

    # 3/4. Pallas kernels
    from diffusionkit_tpu.ops.quantized import random_quantized_linear
    from diffusionkit_tpu.ops.int4_matmul import int4_linear
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree, w4a8_linear

    interp = jax.default_backend() != "tpu"  # CPU smoke runs use interpret
    p = random_quantized_linear(jax.random.PRNGKey(0), K, N, bits=4, bias=False)
    p = {k: v for k, v in p.items() if v is not None}

    def f_int4(x):
        y = int4_linear(p, x, interpret=interp)
        return y[:, :K]

    xb = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    t = chain(f_int4, xb, iters)
    print(f"pallas int4:     {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")

    pw = add_wscale_bound_tree({"p": p})["p"]

    def f_w4a8(x):
        y = w4a8_linear(pw, x, interpret=interp)
        return y[:, :K]

    try:
        t = chain(f_w4a8, xb, iters)
        print(f"pallas w4a8:     {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s")
    except Exception as e:
        print(f"pallas w4a8 FAILED to lower/run: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
