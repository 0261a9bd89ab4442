"""On-chip parity of the COMPILED w4a8 norm_rope epilogue vs the unfused
rms_norm_rope(w4a8_linear(...)) chain at the FLUX 1024² shape.

The interpret-mode CI tests only exercise the kernel's concatenate
fallback; the compiled branch uses pltpu.roll, which cannot run off-chip
(ADVICE r4 #3). This harness is part of the verify recipe for any change
to the norm_rope epilogue (ops/w4a8_matmul.py mode="norm_rope") and was
the gate for flipping DIFFUSIONKIT_TPU_FUSED_QK default-on in round 5
(measured: rel err 0.46%, within bf16 rounding of the unfused chain —
the fused path keeps the norm->rotate chain in f32).

Run on the TPU box:  python tools/qk_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from diffusionkit_tpu.ops.quantized import quantize_linear_params
from diffusionkit_tpu.ops import w4a8_matmul as W
from diffusionkit_tpu.ops.rope import rms_norm_rope, rope_frequencies

assert jax.default_backend() == "tpu", jax.default_backend()

# FLUX 1024² joint-attention shape: 24 heads x 128, 4096 image tokens.
H, HEADS, D = 3072, 24, 128
S_TXT, S_IMG = 256, 4096
rs = np.random.RandomState(0)

p = quantize_linear_params(
    {"kernel": jnp.asarray(rs.randn(H, H) * 0.02, jnp.float32), "bias": None},
    bits=4, group_size=64,
)
p = W.add_wscale_bound_tree(p)
x = jnp.asarray(rs.randn(1, S_IMG, H) * 0.5, jnp.bfloat16)
norm_w = jnp.asarray(rs.rand(D) + 0.5, jnp.bfloat16)
cos, sin = rope_frequencies((64, 64), S_TXT, (32, 48, 48))
cos_img, sin_img = cos[S_TXT:], sin[S_TXT:]

os.environ["DIFFUSIONKIT_TPU_FUSED_QK"] = "1"
assert W.w4a8_qk_eligible(p, D), "shape not eligible"


@jax.jit
def fused(x):
    return W.w4a8_qk_linear(p, x, norm_w, cos_img, sin_img)


@jax.jit
def unfused(x):
    y = W.w4a8_linear(p, x)
    b, s, _ = y.shape
    y = y.reshape(b, s, HEADS, D)
    y = rms_norm_rope(y, norm_w, cos_img[:, None, :], sin_img[:, None, :])
    return y.reshape(b, s, HEADS * D)


a = np.asarray(fused(x), np.float32)
b = np.asarray(unfused(x), np.float32)
scale = np.abs(b).max()
diff = np.abs(a - b).max()
print(f"max|fused-unfused| {diff:.5f}  scale {scale:.3f}  rel {diff/scale:.5f}")
# bf16 rounding between matmul and norm in the unfused path bounds the
# expected difference; the fused path is the more precise one (f32 chain).
assert diff / scale < 3e-2, (diff, scale)
print("QK_PARITY_OK")
