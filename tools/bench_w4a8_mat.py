"""On-chip A/B: fused w4a8 Pallas kernel vs materialize-int8 variants.

The fused kernel re-dequantizes each weight tile once per m-block (4 passes
at FLUX fc1); materializing the int8 grid once per call (dequant_w8_pallas,
one K*N/2-read + K*N-write pass) and feeding a dequant-free int8 matmul
pays the dequant exactly once. Variants:
  kernel   — current fused w4a8_linear Pallas path
  mat_xla  — pallas dequant + XLA int8 dot_general + XLA epilogue
  mat_pl   — pallas dequant + w8_matmul (in-kernel epilogue), block sweep
  mxu8     — plain int8 dot_general, resident weights (int8 dot roofline)
  mxubf16  — bf16 dot_general (bf16 roofline)

Usage: python tools/bench_w4a8_mat.py [M K N [iters]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    M, K, N = (int(a) for a in sys.argv[1:4]) if len(sys.argv) >= 4 else (4352, 3072, 12288)
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    flops = 2.0 * M * K * N
    rs = np.random.RandomState(0)

    from diffusionkit_tpu.ops.quantized import random_quantized_linear
    from diffusionkit_tpu.ops.w4a8_matmul import (
        _scaled_affine,
        add_wscale_bound_tree,
        dequant_w8_pallas,
        w4a8_linear,
        w8_matmul,
    )
    from diffusionkit_tpu.ops.w8a8 import ActQuant, quantize_activations

    p = random_quantized_linear(jax.random.PRNGKey(0), K, N, bits=4, bias=False)
    p = {k: v for k, v in p.items() if v is not None}
    p = add_wscale_bound_tree({"p": p})["p"]
    s8, z8, ws, bias = _scaled_affine(p)
    x8_0, xs_0 = quantize_activations(jnp.asarray(rs.randn(M, K), jnp.bfloat16))
    xb_0 = jnp.asarray(rs.randn(M, K), jnp.bfloat16)
    dq_bk = 1024 if K % 1024 == 0 else 512
    dq_bn = 512 if N % 512 == 0 else 256
    w8_const = jax.block_until_ready(dequant_w8_pallas(p["q4"], s8, z8, bk=dq_bk, bn=dq_bn))
    wb_const = jax.block_until_ready(w8_const.astype(jnp.bfloat16))
    x8_0, xs_0, xb_0 = jax.block_until_ready((x8_0, xs_0, xb_0))

    def timed(name, make_run, *args):
        try:
            run = make_run()
            y = run(*args)
            _ = np.asarray(y[:1, :1])
            t0 = time.perf_counter()
            y = run(*args)
            _ = np.asarray(y[:1, :1])
            t = (time.perf_counter() - t0) / iters
            print(f"{name:24s}  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name:24s}  FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    def feed(y):
        y = y[:M]
        if N < K:
            y = jnp.tile(y, (1, K // N))
        return jnp.clip(y[:, :K], -127, 127).astype(jnp.int8)

    def scanned(step):
        def body(carry, _):
            x8, xs = carry
            return (feed(step(x8, xs)), xs), None

        @jax.jit
        def run(x8, xs):
            (y8, _), _ = jax.lax.scan(body, (x8, xs), None, length=iters)
            return y8

        return run

    # current fused pallas kernel (auto blocks)
    timed("kernel", lambda: scanned(
        lambda x8, xs: w4a8_linear(p, ActQuant(x8, xs, jnp.bfloat16))),
        x8_0, xs_0)

    # pallas dequant + XLA int8 dot + XLA epilogue
    def mat_xla(x8, xs):
        w8 = dequant_w8_pallas(p["q4"], s8, z8, bk=dq_bk, bn=dq_bn)
        acc = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * xs.reshape(-1, 1)
                * ws.reshape(1, -1)).astype(jnp.bfloat16)

    timed("mat_xla", lambda: scanned(mat_xla), x8_0, xs_0)

    # pallas dequant + pallas w8 matmul, block sweep
    zb = jnp.zeros((N,), jnp.float32)
    for bm in (512, 1088, 2176):
        for bk in (512, 1024):
            if K % bk:
                continue
            for bn in (256, 512):
                if N % bn:
                    continue

                def mat_pl(x8, xs, bm=bm, bk=bk, bn=bn):
                    w8 = dequant_w8_pallas(p["q4"], s8, z8, bk=dq_bk, bn=dq_bn)
                    return w8_matmul(x8, w8, ws, xs, zb, bm=bm, bk=bk, bn=bn,
                                     out_dtype=jnp.bfloat16)

                timed(f"mat_pl {bm:4d}/{bk:4d}/{bn:4d}",
                      lambda f=mat_pl: scanned(f), x8_0, xs_0)

    # rooflines
    timed("mxu8", lambda: scanned(
        lambda x8, xs: jax.lax.dot_general(
            x8, w8_const, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), x8_0, xs_0)

    def bf16_step(xb, _):
        return jax.lax.dot_general(
            xb, wb_const, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def scanned_bf16():
        def body(xb, _):
            y = bf16_step(xb, None)[:M]
            if N < K:
                y = jnp.tile(y, (1, K // N))
            return y[:, :K], None

        @jax.jit
        def run(xb):
            y, _ = jax.lax.scan(body, xb, None, length=iters)
            return y

        return run

    timed("mxubf16", scanned_bf16, xb_0)


if __name__ == "__main__":
    main()
