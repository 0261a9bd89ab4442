from .clip import CLIPOutput, apply_clip, init_clip_params
from .mmdit import apply_mmdit, init_mmdit_params
from .t5 import apply_t5_encoder, init_t5_params
from .vae import (
    apply_autoencoder,
    apply_vae_decoder,
    apply_vae_encoder,
    autoencoder_decode,
    autoencoder_encode,
    init_autoencoder_params,
    init_vae_decoder_params,
    init_vae_encoder_params,
)
