"""On-chip sweep of flash-attention q blocks at the model shapes.

At FLUX 1024^2 the joint sequence 4352 is not divisible by the current
q_blk=512 (pads to 4608, +5.9% wasted rows); 256 divides exactly.

Usage: python tools/sweep_flash_blocks.py [B H S D [iters]]
       python tools/sweep_flash_blocks.py --bshd [B H S D [iters]]
--bshd sweeps flash_attention_bshd — the layout the model actually runs
(head picked by column block index; different DMA pattern from the bhsd
kernel, so sweep the kernel you ship).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    argv = sys.argv[1:]
    bshd = "--bshd" in argv
    argv = [a for a in argv if a != "--bshd"]
    B, H, S, D = (int(a) for a in argv[0:4]) if len(argv) >= 4 else (1, 24, 4352, 128)
    iters = int(argv[4]) if len(argv) > 4 else 16
    flops = 4.0 * B * H * S * S * D
    rs = np.random.RandomState(0)
    from diffusionkit_tpu.ops.flash_attention import (
        flash_attention, flash_attention_bshd,
    )

    shape = (B, S, H, D) if bshd else (B, H, S, D)
    fn = flash_attention_bshd if bshd else flash_attention
    q = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rs.randn(*shape) * 0.3, jnp.bfloat16)
    scale = 1.0 / float(np.sqrt(D))
    s128 = -(-S // 128) * 128

    def chain(q_blk, kv_blk):
        def body(c, _):
            o = fn(c, k, v, scale, q_blk=q_blk, kv_blk=kv_blk)
            return (o * 0.5 + c * 0.5).astype(c.dtype), None

        @jax.jit
        def run(x):
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return y

        y = run(q)
        _ = np.asarray(y[:1, :1, :1, :1])
        t0 = time.perf_counter()
        y = run(q)
        _ = np.asarray(y[:1, :1, :1, :1])
        return (time.perf_counter() - t0) / iters

    for q_blk in (128, 256, 512, 1024):
        try:
            t = chain(q_blk, s128)
            print(f"q_blk={q_blk:5d} kv={s128}: {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"q_blk={q_blk:5d} kv={s128}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
