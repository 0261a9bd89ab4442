"""CLI argument-surface tests (reference generate_images.py:41-127 parity).

Parser-level only — pipeline construction needs checkpoints (covered by
tests/test_golden.py when available).
"""

import pytest

from diffusionkit_tpu.scripts.generate_images import HEIGHT, SHIFT, WIDTH, build_parser


def test_parser_defaults():
    args = build_parser().parse_args(["--prompt", "a cat"])
    assert args.model_version == "argmaxinc/mlx-FLUX.1-schnell"
    assert args.steps == 50 and args.cfg == 5.0
    assert args.low_memory_mode is True
    assert args.denoise == 0.0
    assert args.num_images == 1


def test_parser_full_flag_surface():
    args = build_parser().parse_args([
        "--prompt", "p", "--image-path", "x.png",
        "--model-version", "argmaxinc/mlx-stable-diffusion-3-medium",
        "--steps", "10", "--cfg", "7", "--negative_prompt", "bad",
        "--preload-models", "-o", "y.png", "--seed", "3", "-v",
        "--shift", "2.5", "--t5", "--height", "768", "--width", "512",
        "--no-low-memory-mode", "--benchmark-mode", "--denoise", "0.4",
        "--local-ckpt", "/tmp/ckpt.safetensors", "--num-images", "2",
        "--guidance", "4.0", "--use-scan",
    ])
    assert args.low_memory_mode is False
    assert args.t5 and args.benchmark_mode and args.use_scan
    assert args.shift == 2.5 and args.denoise == 0.4


def test_parser_rejects_unknown_model():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--prompt", "p", "--model-version", "nope"])


def test_per_model_defaults_cover_registry():
    from diffusionkit_tpu.model_io import MMDIT_CKPT

    for k in MMDIT_CKPT:
        assert k in HEIGHT and k in WIDTH and k in SHIFT
