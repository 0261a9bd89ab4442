"""Encoder-level T5 outlier A/B at full T5-XXL scale (VERDICT round 4 task
#4, full-size leg; the small-config failure-mode gate lives in
tests/test_smoothquant.py::test_outlier_db_margin_and_absolute_floor).

Injects heavy-tailed residual-stream outlier channels into the mirror
T5-XXL (the regime real T5-XXL is known for — the reason
ops/smoothquant.py exists), then measures encoder-output SNR vs the bf16
encoder for w8a8 WITH the SmoothQuant fold vs WITHOUT. Image-level A/Bs
cost ~70 min/arm (two 12B pipeline builds); the encoder-level A/B
measures the same mechanism directly in ~15 min.

Round-5 result on the v5e (benchmarks/t5_outlier_ab_r5.json):
plain w8a8 23.26 dB, SmoothQuant w8a8 30.78 dB — +7.52 dB margin.

Run on the TPU box:
  DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror python tools/t5_outlier_ab.py
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("DIFFUSIONKIT_TPU_CKPT_DIR", "/root/repo/.ckpt_mirror")

import numpy as np
import jax
import jax.numpy as jnp

import quant_quality as qq  # tools/ — reuse the exact outlier injection

N_OUT, FACTOR = 16, 50.0
qq._install_t5_outlier_injection(N_OUT, FACTOR)

from diffusionkit_tpu import model_io
from diffusionkit_tpu.config import T5_XXL
from diffusionkit_tpu.models.t5 import apply_t5_encoder
from diffusionkit_tpu.ops.smoothquant import smooth_t5
from diffusionkit_tpu.ops.w8a8 import w8a8_tree
from diffusionkit_tpu.utils import enable_compilation_cache


def main(out_path="/tmp/t5_ab.json"):
    enable_compilation_cache()
    tok = model_io.load_t5_tokenizer(256)
    prompts = [
        "a photo of a cat in a wizard hat",
        "an astronaut riding a horse on the moon, photorealistic",
    ]

    def row(p):
        ids = list(tok.tokenize(p))[:256]
        return np.pad(np.asarray(ids, np.int32), (0, 256 - len(ids)))

    tokens = np.stack([row(p) for p in prompts])
    print("tokens", tokens.shape, flush=True)

    t0 = time.time()
    host = model_io.load_t5_encoder(jnp.bfloat16, to_device=False)
    print(f"load {time.time() - t0:.0f}s", flush=True)

    def fwd(tree):
        dev = jax.device_put(tree)
        y = apply_t5_encoder(dev, jnp.asarray(tokens), T5_XXL)
        out = np.asarray(y, np.float32)
        del dev, y
        gc.collect()
        return out

    t0 = time.time()
    base = fwd(host)
    print(f"bf16 fwd {time.time() - t0:.0f}s  out std {base.std():.3f}", flush=True)

    def snr(y):
        e = np.linalg.norm(y - base) / np.linalg.norm(base)
        return round(float(-20 * np.log10(max(float(e), 1e-9))), 2)

    t0 = time.time()
    plain = w8a8_tree(host)
    print(f"w8a8 plain quantize {time.time() - t0:.0f}s", flush=True)
    s_plain = snr(fwd(plain))
    del plain
    gc.collect()
    print(f"plain w8a8 SNR {s_plain} dB", flush=True)

    t0 = time.time()
    smoothed = smooth_t5(host, T5_XXL, tok)
    sm_tree = w8a8_tree(smoothed)
    del smoothed
    gc.collect()
    print(f"smooth+quantize {time.time() - t0:.0f}s", flush=True)
    s_smooth = snr(fwd(sm_tree))
    print(f"smooth w8a8 SNR {s_smooth} dB", flush=True)

    out = {
        "t5_outlier_channels": N_OUT,
        "t5_outlier_factor": FACTOR,
        "encoder_snr_db": {"w8a8_plain": s_plain, "w8a8_smooth": s_smooth},
        "margin_db": round(s_smooth - s_plain, 2),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
