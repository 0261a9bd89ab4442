"""On-chip sweep of w4a8 kernel block configs at a given GEMM shape.

The in-kernel epilogue emits bf16 (half the old int32 output block), which
may admit larger bm than the pick_m_block cap. Prints ms + effective TFLOP/s
per (bm, bk, bn); configs that fail to fit VMEM print FAIL and continue.

Usage: python tools/sweep_w4a8_blocks.py [M K N [iters]]
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
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree, w4a8_linear

    p = random_quantized_linear(jax.random.PRNGKey(0), K, N, bits=4, bias=False)
    p = {k: v for k, v in p.items() if v is not None}
    p = add_wscale_bound_tree({"p": p})["p"]
    x0 = jnp.asarray(rs.randn(M, K), jnp.bfloat16)

    def chain(bm, n_iter):
        def body(x, _):
            y = w4a8_linear(p, x, bm=bm)
            return y[:, :K], None

        @jax.jit
        def run(x):
            y, _ = jax.lax.scan(body, x, None, length=n_iter)
            return y

        y = run(x0)
        _ = np.asarray(y[:1, :1])
        t0 = time.perf_counter()
        y = run(x0)
        _ = np.asarray(y[:1, :1])
        return (time.perf_counter() - t0) / n_iter

    for bm in (512, 1088, 1536, 2176, 4352):
        try:
            t = chain(bm, iters)
            print(f"bm={bm:5d}:  {t*1e3:8.2f} ms  {flops/t/1e12:7.1f} TFLOP/s", flush=True)
        except Exception as e:  # VMEM overflow / lowering failure
            print(f"bm={bm:5d}:  FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
