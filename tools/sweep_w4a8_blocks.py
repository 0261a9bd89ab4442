"""On-chip sweep of w4a8 kernel block configs at a given GEMM shape.

The weight tile is unpacked + requantized once per M block, so the dequant
VPU cost scales with ceil(M/bm); larger bm needs the (bm, bk) x tile + the
(bm, bn) accumulator to fit VMEM, and shrinking bn buys bm headroom without
changing the dequant count. (An m-innermost superblock grid and a
materialize-int8 + dequant-free matmul were both built and measured SLOWER
than this fused m-outer kernel at FLUX shapes — see tools/bench_w4a8_mat.py
— so the dequant redundancy is already hidden behind the MXU here.)
Prints ms + effective TFLOP/s per (bm, bk, bn); configs that fail to fit
VMEM print FAIL and continue.

Usage: python tools/sweep_w4a8_blocks.py [M K N [iters [mode]]]
  mode: plain (default) | gelu  (fc1's gelu_quant epilogue)
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
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
    flops = 2.0 * M * K * N
    rs = np.random.RandomState(0)

    from diffusionkit_tpu.ops.quantized import random_quantized_linear
    from diffusionkit_tpu.ops.w4a8_matmul import (
        _scaled_affine,
        add_wscale_bound_tree,
        w4a8_matmul,
    )
    from diffusionkit_tpu.ops.w8a8 import quantize_activations

    p = random_quantized_linear(jax.random.PRNGKey(0), K, N, bits=4, bias=False)
    p = {k: v for k, v in p.items() if v is not None}
    p = add_wscale_bound_tree({"p": p})["p"]
    s8, z8, ws, bias = _scaled_affine(p)
    x8_0, xs_0 = quantize_activations(jnp.asarray(rs.randn(M, K), jnp.bfloat16))
    x8_0, xs_0 = jax.block_until_ready((x8_0, xs_0))

    def next_x(out):
        # feed the output back as a same-shape (M, K) int8 input
        y = out[:M]
        if N < K:
            y = jnp.tile(y, (1, K // N))
        return jnp.clip(y[:, :K], -127, 127).astype(jnp.int8)

    def chain(bm, bk, bn, n_iter):
        kw = dict(bm=bm, bk=bk, bn=bn)
        if mode == "gelu":
            kw["mode"] = "gelu_quant"

        def body(carry, _):
            x8, xs = carry
            out = w4a8_matmul(x8, p["q4"], s8, z8, ws, xs, bias, **kw)
            if mode == "gelu":
                y8, yss = out
                return (next_x(y8), xs), None
            return (next_x(out), xs), None

        @jax.jit
        def run(x8, xs):
            (y8, _), _ = jax.lax.scan(body, (x8, xs), None, length=n_iter)
            return y8

        y = run(x8_0, xs_0)
        _ = np.asarray(y[:1, :1])
        t0 = time.perf_counter()
        y = run(x8_0, xs_0)
        _ = np.asarray(y[:1, :1])
        return (time.perf_counter() - t0) / n_iter

    bms = [b for b in (512, 1088, 1536, 2176) if b <= M + 127]
    bks = [bk for bk in (512, 1024, 1536) if K % bk == 0]
    bns = [bn for bn in (256, 512, 1024) if N % bn == 0]
    for bk in bks:
        for bn in bns:
            for bm in bms:
                try:
                    t = chain(bm, bk, bn, iters)
                    print(
                        f"bm={bm:5d} bk={bk:5d} bn={bn:5d}:  {t*1e3:8.2f} ms"
                        f"  {flops/t/1e12:7.1f} TFLOP/s", flush=True,
                    )
                except Exception as e:  # VMEM overflow / lowering failure
                    print(
                        f"bm={bm:5d} bk={bk:5d} bn={bn:5d}:  FAIL"
                        f" {type(e).__name__}: {str(e)[:120]}", flush=True,
                    )


if __name__ == "__main__":
    main()
