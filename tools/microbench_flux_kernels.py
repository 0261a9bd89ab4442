"""On-chip microbench of the FLUX 1024² hot kernels at their exact shapes.

The round-3 profile (profile_step.py flux-w4a8) attributes 408 ms/step as:
flash 99 ms, w4a8 GEMMs ~160 ms, fused quant producers ~40 ms, XLA loop
fusions 55 ms. This tool times each kernel family standalone — wrapped in an
in-graph lax.scan chain so the ~13 ms relay dispatch amortises away (verify
skill: op-level microbenches are noise otherwise) — and A/Bs candidate
variants (gelu erf vs tanh form, fused-rows block sizes, flash q/kv blocks).

Usage: python tools/microbench_flux_kernels.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S_UNI = 4352          # 1024² joint sequence (4096 img + 256 txt)
H = 3072
DFF = 12288
ITERS = 30


def timed_chain(fn, x, iters=ITERS):
    """Time fn chained iters times in ONE jitted scan; returns ms/call.

    The chain REDUCES to a scalar on device before the host transfer — the
    relay moves ~100 MB/s, so transferring a full (S, DFF) output would
    drown the kernel being timed ~30x (verify-skill rule; the first version
    of this tool made exactly that mistake)."""

    def body(carry, _):
        return fn(carry), None

    @jax.jit
    def run(x0):
        out = jax.lax.scan(body, x0, None, length=iters)[0]
        return jnp.sum(out.astype(jnp.float32))

    float(np.asarray(run(x)))  # settle compile
    t0 = time.perf_counter()
    float(np.asarray(run(x)))
    return (time.perf_counter() - t0) / iters * 1000


def bench_gelu_quantize():
    from diffusionkit_tpu.ops.fused_quant import gelu_quantize

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(S_UNI, DFF).astype(np.float32), jnp.bfloat16)
    res = {}

    def roundtrip(y):
        aq = gelu_quantize(y)
        # feed int8 back to a bf16 carry so the chain has a fixed signature
        return (aq.x8.astype(jnp.bfloat16) * aq.xscale.astype(jnp.bfloat16))

    for variant in ("erf", "tanh"):
        os.environ["DIFFUSIONKIT_TPU_GELU_FORM"] = variant
        res[f"gelu_quantize_{variant}_ms"] = round(timed_chain(roundtrip, x), 3)
    os.environ.pop("DIFFUSIONKIT_TPU_GELU_FORM", None)
    return res


def bench_mod_ln_quantize():
    from diffusionkit_tpu.ops.fused_quant import mod_ln_quantize

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, S_UNI, H).astype(np.float32), jnp.bfloat16)
    sh = jnp.asarray(rs.randn(1, 1, H).astype(np.float32), jnp.bfloat16)
    sc = jnp.asarray(rs.randn(1, 1, H).astype(np.float32), jnp.bfloat16)
    res = {}
    for rows in (0, 128, 256, 512):
        if rows:
            os.environ["DIFFUSIONKIT_TPU_FUSED_ROWS"] = str(rows)
        else:
            os.environ.pop("DIFFUSIONKIT_TPU_FUSED_ROWS", None)

        def roundtrip(y):
            aq = mod_ln_quantize(y, sh, sc)
            return aq.x8.astype(jnp.bfloat16) * aq.xscale.astype(jnp.bfloat16)

        res[f"mod_ln_quantize_rows{rows or 'auto'}_ms"] = round(
            timed_chain(roundtrip, x), 3
        )
    os.environ.pop("DIFFUSIONKIT_TPU_FUSED_ROWS", None)
    return res


def bench_mod_ln_bf16():
    from diffusionkit_tpu.ops.fused_quant import mod_ln
    from diffusionkit_tpu.ops.norms import modulated_layer_norm

    rs = np.random.RandomState(2)
    # SD3 512² img-stream shape (the headline bench's hot LN site).
    x = jnp.asarray(rs.randn(2, 1024, 1536).astype(np.float32), jnp.bfloat16)
    sh = jnp.asarray(rs.randn(2, 1, 1536).astype(np.float32), jnp.bfloat16)
    sc = jnp.asarray(rs.randn(2, 1, 1536).astype(np.float32), jnp.bfloat16)
    return {
        "mod_ln_pallas_sd3_ms": round(
            timed_chain(lambda y: mod_ln(y, sh, sc), x), 3
        ),
        "mod_ln_xla_sd3_ms": round(
            timed_chain(lambda y: modulated_layer_norm(y, sh, sc), x), 3
        ),
    }


def bench_flash():
    from diffusionkit_tpu.ops.flash_attention import flash_attention_bshd

    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(1, S_UNI, 24, 128).astype(np.float32), jnp.bfloat16)
    scale = 128**-0.5
    res = {}
    for q_blk, kv_blk in ((0, 0), (1024, 1024), (512, 1024), (1024, 2176),
                          (2176, 2176), (512, 4352), (1024, 4352)):
        name = f"flash_{q_blk or 'auto'}x{kv_blk or 'auto'}"
        try:
            ms = timed_chain(
                lambda y: flash_attention_bshd(
                    y, q, q, scale, q_blk=q_blk, kv_blk=kv_blk
                ),
                q,
            )
            res[name + "_ms"] = round(ms, 3)
        except Exception as e:  # VMEM overflow etc.
            res[name + "_ms"] = f"fail: {type(e).__name__}"
    return res


def bench_w4a8():
    from diffusionkit_tpu.ops.quantized import random_quantized_linear
    from diffusionkit_tpu.ops.w4a8_matmul import add_wscale_bound_tree, w4a8_linear
    from diffusionkit_tpu.ops.w8a8 import quantize_shared

    rs = np.random.RandomState(4)
    res = {}
    for name, k, n in (("fc1", H, DFF), ("fc2", DFF, H), ("qkvo", H, H)):
        p = add_wscale_bound_tree(
            random_quantized_linear(jax.random.PRNGKey(0), k, n, bits=4)
        )
        x = jnp.asarray(rs.randn(S_UNI, k).astype(np.float32), jnp.bfloat16)

        def step(y):
            out = w4a8_linear(p, quantize_shared(y))
            # keep the carry shape (S, k): fold n -> k with a cheap slice/pad
            if n >= k:
                return out[:, :k]
            return jnp.pad(out, ((0, 0), (0, k - n)))

        res[f"w4a8_{name}_ms"] = round(timed_chain(step, x), 3)
    return res


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/microbench_flux.json"
    report = {}
    for fn in (bench_mod_ln_bf16, bench_mod_ln_quantize, bench_gelu_quantize,
               bench_flash, bench_w4a8):
        try:
            report.update(fn())
        except Exception as e:
            report[fn.__name__] = f"fail: {type(e).__name__}: {e}"
        print(json.dumps(report), flush=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
