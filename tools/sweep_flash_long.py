"""On-chip sweep of STREAMING flash-attention tiles at long sequences.

VERDICT round 2, Weak #2: the s > single-kv-cap fallback hard-codes 512/1024
tiles that were never swept at the shapes that actually use them (2048²
resolutions: s = 16384 image tokens + text). This sweeps (q_blk, kv_blk)
over the streaming grid for both kernel layouts at the 2048² joint shapes
and prints ms/call + TFLOP/s; the winner goes into
ops/flash_attention.pick_flash_blocks as the swept long-sequence table.

Usage: python tools/sweep_flash_long.py [bshd|bhsd] [S D H [iters]]
Defaults: bshd, FLUX-2048² (S=16640, D=128, H=24), 4 iters.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    layout = sys.argv[1] if len(sys.argv) > 1 else "bshd"
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16640
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    B = 1
    flops = 4.0 * B * H * S * S * D
    rs = np.random.RandomState(0)
    from diffusionkit_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_bshd,
    )

    if layout == "bshd":
        shape = (B, S, H, D)
        fn = flash_attention_bshd
    else:
        shape = (B, H, S, D)
        fn = flash_attention
    q = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    scale = 1.0 / float(np.sqrt(D))

    def chain(q_blk, kv_blk):
        def body(c, _):
            o = fn(c, k, v, scale, q_blk=q_blk, kv_blk=kv_blk)
            return (o * 0.5 + c * 0.5).astype(c.dtype), None

        @jax.jit
        def run(x):
            y, _ = jax.lax.scan(body, x, None, length=iters)
            # Reduce ON DEVICE: transferring the full (B,S,H,D) output
            # through the axon relay (~100 MB/s) would drown the kernel
            # time (a 2048^2 bf16 q is ~400 MB ~= 4 s of transfer).
            return jnp.sum(y, dtype=jnp.float32)

        _ = float(run(q))
        t0 = time.perf_counter()
        _ = float(run(q))
        return (time.perf_counter() - t0) / iters

    print(f"layout={layout} S={S} D={D} H={H}", flush=True)
    for q_blk in (256, 512, 1024):
        for kv_blk in (512, 1024, 2048, 4096):
            try:
                t = chain(q_blk, kv_blk)
                print(
                    f"q={q_blk:5d} kv={kv_blk:5d}: {t*1e3:8.2f} ms "
                    f"{flops/t/1e12:6.1f} TFLOP/s",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"q={q_blk:5d} kv={kv_blk:5d}: FAIL {type(e).__name__} "
                    f"{str(e)[:100]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
