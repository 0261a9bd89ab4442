"""diffusionkit-tpu: TPU-native latent-diffusion image generation.

A ground-up JAX/XLA/Pallas re-design with the capability set of
argmaxinc/DiffusionKit (SD3-medium, SD3.5-large, FLUX.1-schnell/dev txt2img
and img2img from HF safetensors checkpoints), plus TPU-only capabilities:
GSPMD tensor/data-parallel generation over device meshes and a Pallas flash
attention kernel for the joint text+image sequence.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    FLUX_DEV,
    FLUX_SCHNELL,
    SD3_2b,
    SD3_8b,
    MMDiTConfig,
)
from .model_io import MMDIT_CKPT, T5_MAX_LENGTH  # noqa: F401
from .pipeline import (  # noqa: F401
    DiffusionPipeline,
    FluxLatentFormat,
    FluxPipeline,
    LatentFormat,
    SD3LatentFormat,
)
from .sampler import FluxSampler, ModelSamplingDiscreteFlow  # noqa: F401
