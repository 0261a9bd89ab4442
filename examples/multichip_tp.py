"""Tensor-parallel + data-parallel generation over a TPU slice.

The pipeline takes a (data, model) jax.sharding.Mesh: the MMDiT loads
column/row-sharded over the model axis (Megatron rules incl. quantized
leaves, parallel/sharding.py), encoders/VAE replicate, and the batch
shards over the data axis. On a real slice the collectives ride ICI; on a
CPU box this demonstrates the same program on 8 virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_tp.py --dp 2 --tp 4

Multi-host: call diffusionkit_tpu.parallel.init_distributed() first (one
process per host), then build the mesh over jax.devices().
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="argmaxinc/mlx-stable-diffusion-3-medium")
    ap.add_argument("--prompt", default="a photo of a cat in a wizard hat")
    ap.add_argument("--dp", type=int, default=2, help="data-parallel ways")
    ap.add_argument("--tp", type=int, default=4, help="tensor-parallel ways")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=28)
    args = ap.parse_args()

    import jax

    from diffusionkit_tpu.parallel import create_mesh
    from diffusionkit_tpu.pipeline import DiffusionPipeline

    n = args.dp * args.tp
    assert len(jax.devices()) >= n, (
        f"need {n} devices, have {len(jax.devices())}"
    )
    mesh = create_mesh(args.dp, args.tp, devices=jax.devices()[:n])
    print("mesh:", mesh)

    pipe = DiffusionPipeline(
        model_version=args.model,
        shift=3.0,
        low_memory_mode=False,
        mesh=mesh,  # weights shard at load; denoise runs SPMD
    )
    # num_images = dp ways -> one latent per data-parallel group.
    images = pipe.generate_images_batched(
        [args.prompt] * args.dp,
        num_steps=args.steps,
        cfg_weight=5.0,
        latent_size=(args.size // 8, args.size // 8),
        seeds=list(range(args.dp)),
    )
    for i, img in enumerate(images):
        img.save(f"tp_out_{i}.png")
    print(f"wrote {len(images)} images")


if __name__ == "__main__":
    main()
