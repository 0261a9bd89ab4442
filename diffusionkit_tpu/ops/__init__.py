from .attention import sdpa, xla_sdpa
from .common import ffn_gelu, linear, mlp_silu, patchify, timestep_embedding
from .norms import group_norm, layer_norm, modulated_layer_norm, rms_norm
from .rope import apply_rope, rope_frequencies
