"""Flax denoiser zoo + VAEs + text encoders (reference model surface,
SURVEY.md §2 table B). All full-size configs default to scan-over-layers
(stacked params) and bf16 compute."""

from tdm_tpu.models import (  # noqa: F401
    clip,
    cogvideox,
    layers,
    mmdit_sd3,
    pixart,
    t5,
    unet_sd15,
    vae,
    vae3d,
)
