"""LoRA adapters: low-rank pytree factors merged on-device, with kohya and
diffusers/peft safetensors interchange (reference surface: peft injection
`src/main.py:43`, runtime `set_adapters` scaling `README.md:50`, kohya
export `src/utils.py:74-93`)."""

from tdm_tpu.lora.adapter import (  # noqa: F401
    LoRA,
    default_target,
    init_lora,
    merge,
    wrap_denoise_fn,
)
from tdm_tpu.lora.io import load_lora, save_kohya  # noqa: F401
from tdm_tpu.lora.adapter import extract_lora  # noqa: F401
