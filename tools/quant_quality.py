"""Perceptual quality of every quantization mode vs the bf16 pipeline.

VERDICT round 2, Weak #4: the quantized kernels were verified mechanically
(grid membership, parity vs dequant oracles) but never perceptually. This
tool runs the pinned golden prompt through the full-size mirror checkpoint
(`.ckpt_mirror`, CLAUDE.md) once at bf16 and once per quantization mode at
identical seed, and reports PSNR vs the bf16 image — the quality number the
README's mode table advertises. PSNR >= 20 dB is the reference's own
golden-gate convention (reference tests/mlx/test_diffusion_pipeline.py:20).

Usage (on the TPU, one process at a time):
  DIFFUSIONKIT_TPU_CKPT_DIR=/root/repo/.ckpt_mirror \
      python tools/quant_quality.py [--steps 10] [--out quant_quality.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE on the quantized-tree disk cache: mode-table runs may use it (keys
# embed mode/group/algorithm, and quantization is deterministic), but the
# --t5 outlier-injection path must NOT — the injection perturbs weights
# in-memory without changing the cache key (see main()).

MODEL = "argmaxinc/mlx-stable-diffusion-3-medium"
PROMPT = "a photo of a cat in a wizard hat"
MODES = [None, "int8", "int4", "w8a8", "w4a8", "int4-mixed", "w4a8-mixed"]


def run(mode, steps, latent_hw):
    from diffusionkit_tpu.pipeline import DiffusionPipeline

    t0 = time.time()
    pipe = DiffusionPipeline(
        model_version=MODEL,
        shift=3.0,
        use_t5=False,
        low_memory_mode=False,
        quantize_mmdit=mode,
    )
    img, _ = pipe.generate_image(
        PROMPT,
        num_steps=steps,
        cfg_weight=5.0,
        latent_size=latent_hw,
        seed=42,
        verbose=False,
    )
    del pipe
    import numpy as np

    return np.asarray(img, np.float32), time.time() - t0


def _install_t5_outlier_injection(n_channels: int, factor: float):
    """Wrap model_io.load_t5_encoder so the (synthetic, Gaussian) mirror T5
    acquires realistic heavy-tailed residual-stream outlier channels —
    real T5-XXL carries a few channels 1-2 orders of magnitude hotter than
    the rest, which is exactly what per-token dynamic int8 clips. Both the
    bf16 baseline and the quantized run get the SAME injection, so the PSNR
    between them isolates the quantization loss (VERDICT round 3, Weak #3:
    the old 49.2 dB number was measured on outlier-free weights and was not
    going to survive real checkpoints)."""
    import numpy as np

    from diffusionkit_tpu import model_io

    orig = model_io.load_t5_encoder

    def load_with_outliers(dtype, to_device=True):
        import jax

        params = orig(dtype, to_device=False)
        d = np.asarray(params["wte"]).shape[1]
        channels = np.random.RandomState(7).choice(d, n_channels, replace=False)
        wte = np.array(params["wte"], copy=True)
        wo = np.array(params["layers"]["wo"]["kernel"], copy=True)
        for ch in channels:
            wte[:, ch] *= np.asarray(factor, wte.dtype)
            wo[:, :, ch] *= np.asarray(factor, wo.dtype)
        params = dict(params)
        params["wte"] = wte
        params["layers"] = dict(params["layers"])
        params["layers"]["wo"] = dict(params["layers"]["wo"])
        params["layers"]["wo"]["kernel"] = wo
        print(f"[t5-outliers] injected {n_channels} channels x{factor}", flush=True)
        return jax.device_put(params) if to_device else params

    model_io.load_t5_encoder = load_with_outliers
    # Injected T5 weights must never hit (or read) the quantized-tree disk
    # cache — its key derives from the untouched source file. The MMDiT
    # cache stays usable (the injection never touches MMDiT weights).
    orig_cache = model_io.quant_cache_path
    model_io.quant_cache_path = lambda tag, src: (
        None if tag.startswith("t5_") else orig_cache(tag, src)
    )


def run_flux_t5(quantize_t5, steps, latent_hw):
    """FLUX-schnell w4a8 with bf16 vs w8a8 T5 — isolates the quantize_t5
    quality impact (the outlier-channel risk noted in pipeline.py). bf16 T5
    runs in low-memory mode (encode, then free) so both fit the 16 GB chip."""
    from diffusionkit_tpu.pipeline import FluxPipeline

    t0 = time.time()
    pipe = FluxPipeline(
        model_version="argmaxinc/mlx-FLUX.1-schnell",
        shift=1.0,
        low_memory_mode=True,
        quantize_mmdit="w4a8",
        quantize_t5=quantize_t5,
    )
    img, _ = pipe.generate_image(
        PROMPT,
        num_steps=steps,
        cfg_weight=0.0,
        latent_size=latent_hw,
        seed=42,
        verbose=False,
    )
    del pipe
    import numpy as np

    return np.asarray(img, np.float32), time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="quant_quality.json")
    ap.add_argument("--modes", default=None,
                    help="comma-separated subset of modes to measure "
                    "(e.g. 'int4-mixed,w4a8-mixed'); the bf16 base always "
                    "runs first")
    ap.add_argument("--deadline-epoch", type=int, default=0,
                    help="unix time past which NO new mode starts (the table "
                    "is written incrementally, so stopping between modes "
                    "leaves a valid artifact). In-process deadline beats an "
                    "outer `timeout` kill: a killed TPU process orphans the "
                    "chip claim ~10 min (.claude/skills/verify), which is "
                    "exactly what deadlocked the round-4 driver bench.")
    ap.add_argument("--t5", action="store_true",
                    help="measure quantize_t5 (w8a8 T5) on FLUX-schnell "
                    "instead of the MMDiT mode table (use --steps 4 for "
                    "the schnell-native schedule)")
    ap.add_argument("--t5-outliers", type=int, default=16, metavar="N",
                    help="inject N heavy-tailed outlier channels (x factor "
                    "below) into the synthetic T5 before BOTH runs, so the "
                    "measurement reflects real T5-XXL statistics; 0 disables")
    ap.add_argument("--t5-outlier-factor", type=float, default=50.0)
    ap.add_argument("--t5-no-smooth", action="store_true",
                    help="disable the SmoothQuant fold (A/B the mitigation)")
    args = ap.parse_args()

    assert os.environ.get("DIFFUSIONKIT_TPU_CKPT_DIR"), (
        "set DIFFUSIONKIT_TPU_CKPT_DIR (e.g. /root/repo/.ckpt_mirror)"
    )
    from diffusionkit_tpu.utils import image_psnr

    latent_hw = (args.size // 8, args.size // 8)
    if args.t5:
        if args.t5_outliers:
            _install_t5_outlier_injection(args.t5_outliers, args.t5_outlier_factor)
        if args.t5_no_smooth:
            os.environ["DIFFUSIONKIT_TPU_T5_SMOOTH"] = "0"
        base, dt_base = run_flux_t5(False, args.steps, latent_hw)
        quant, dt_quant = run_flux_t5(True, args.steps, latent_hw)
        psnr = float(image_psnr(base, quant))
        out = {
            "model": "argmaxinc/mlx-FLUX.1-schnell (w4a8 MMDiT)",
            "size": args.size, "prompt": PROMPT,
            "t5_outlier_channels": args.t5_outliers,
            "t5_outlier_factor": args.t5_outlier_factor,
            "smoothquant": not args.t5_no_smooth,
            "t5_w8a8_psnr_vs_bf16_t5_db": round(psnr, 2),
            "wall_s": {"bf16_t5": round(dt_base, 1),
                       "w8a8_t5": round(dt_quant, 1)},
        }
        print(json.dumps(out), flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print("wrote", args.out, flush=True)
        return
    modes = MODES
    if args.modes:
        wanted = {m.strip() for m in args.modes.split(",")}
        modes = [None] + [m for m in MODES if m in wanted]
    results = {}
    base = None
    for mode in modes:
        if args.deadline_epoch and time.time() > args.deadline_epoch:
            print(f"[deadline] skipping remaining modes from {mode or 'bf16'}",
                  flush=True)
            break
        img, dt = run(mode, args.steps, latent_hw)
        name = mode or "bf16"
        if base is None:
            base = img
            results[name] = {"psnr_vs_bf16_db": None, "wall_s": round(dt, 1)}
        else:
            psnr = float(image_psnr(base, img))
            results[name] = {"psnr_vs_bf16_db": round(psnr, 2), "wall_s": round(dt, 1)}
        print(json.dumps({name: results[name]}), flush=True)
        # Write incrementally: a deadline-guard timeout mid-table still
        # leaves a valid artifact with every completed mode.
        with open(args.out, "w") as f:
            json.dump(
                {"model": MODEL, "steps": args.steps, "size": args.size,
                 "prompt": PROMPT, "modes": results},
                f, indent=2,
            )
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
