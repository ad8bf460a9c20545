"""`from_pretrained` — directory-based pipeline assembly.

The reference's primary verb (`StableDiffusion3Pipeline.from_pretrained`,
`DiffusionPipeline.from_pretrained`, §3.4) materialized for our artifact
layout. A pipeline directory is:

    my_pipe/
      pipeline.json               {"family": "pixart", "model": {...},
                                   "vae": {...}}   (config overrides)
      transformer.safetensors     denoiser params (io/params format, i.e.
                                  converted via cli/convert_checkpoint)
      vae_decoder.safetensors     optional decoder params
      text_encoder.safetensors    optional (T5/CLIP) params
      tokenizer/                  optional HF tokenizer dir

`save_pretrained(pipe_dir, ...)` writes the same layout from live params, so
train CLI outputs round-trip into pipelines with two lines.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

from tdm_tpu.io import params as params_io

FAMILIES = ("pixart", "sd3", "sd15", "cogvideox")


def save_pretrained(
    path: str,
    *,
    family: str,
    transformer_params: Any,
    model_config: Optional[dict] = None,
    vae_params: Any = None,
    vae_config: Optional[dict] = None,
    text_encoder_params: Any = None,
) -> None:
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r} (one of {FAMILIES})")
    os.makedirs(path, exist_ok=True)
    meta = {"family": family, "model": model_config or {}, "vae": vae_config or {}}
    with open(os.path.join(path, "pipeline.json"), "w") as f:
        json.dump(meta, f, indent=1)
    params_io.save_params(
        transformer_params, os.path.join(path, "transformer.safetensors")
    )
    if vae_params is not None:
        params_io.save_params(
            vae_params, os.path.join(path, "vae_decoder.safetensors")
        )
    if text_encoder_params is not None:
        params_io.save_params(
            text_encoder_params, os.path.join(path, "text_encoder.safetensors")
        )


def _fix(conf: dict) -> dict:
    """JSON config → dataclass kwargs (dtype strings → jnp dtypes)."""
    import jax.numpy as jnp

    out = dict(conf)
    if isinstance(out.get("dtype"), str):
        out["dtype"] = jnp.dtype(out["dtype"]).type
    if isinstance(out.get("block_widths"), list):
        out["block_widths"] = tuple(out["block_widths"])
    return out


def from_pretrained(path: str, **kwargs):
    """Assemble the right pipeline class from a pipeline directory. Extra
    kwargs pass through to the pipeline constructor (e.g. flow_shift)."""
    with open(os.path.join(path, "pipeline.json")) as f:
        meta = json.load(f)
    family = meta["family"]
    tparams = params_io.load_params(
        os.path.join(path, "transformer.safetensors")
    )
    vae_file = os.path.join(path, "vae_decoder.safetensors")
    vparams = params_io.load_params(vae_file) if os.path.exists(vae_file) else None
    mconf = _fix(meta.get("model", {}))
    vconf = _fix(meta.get("vae", {}))

    if family == "pixart":
        from tdm_tpu.models import pixart, vae as vae_lib
        from tdm_tpu.pipelines.pixart import PixArtPipeline

        cfg = dataclasses.replace(pixart.PixArtConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.TAESDConfig(), **vconf)
        return PixArtPipeline(
            pixart.PixArtTransformer2D(cfg=cfg), tparams,
            vae_decoder=vae_lib.TAESDDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor, **kwargs,
        )
    if family == "sd3":
        from tdm_tpu.models import mmdit_sd3, vae as vae_lib
        from tdm_tpu.pipelines.sd3 import SD3Pipeline

        cfg = dataclasses.replace(mmdit_sd3.MMDiTConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.TAESDConfig.taesd3(), **vconf)
        return SD3Pipeline(
            mmdit_sd3.SD3Transformer2D(cfg=cfg), tparams,
            vae_decoder=vae_lib.TAESDDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor,
            vae_shift=vcfg.shift_factor, **kwargs,
        )
    if family == "sd15":
        from tdm_tpu.models import unet_sd15, vae as vae_lib
        from tdm_tpu.pipelines.sd15 import SD15Pipeline

        cfg = dataclasses.replace(unet_sd15.UNetConfig(), **mconf)
        vcfg = dataclasses.replace(vae_lib.KLVAEConfig(), **vconf)
        return SD15Pipeline(
            unet_sd15.UNet2DCondition(cfg=cfg), tparams,
            vae_decoder=vae_lib.KLDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_scaling=vcfg.scaling_factor, **kwargs,
        )
    if family == "cogvideox":
        from tdm_tpu.models import cogvideox as cog, vae3d
        from tdm_tpu.pipelines.cogvideox import CogVideoXPipeline

        cfg = dataclasses.replace(cog.CogVideoXConfig(), **mconf)
        vcfg = dataclasses.replace(vae3d.VAE3DConfig(), **vconf)
        return CogVideoXPipeline(
            cog.CogVideoXTransformer3D(cfg=cfg), tparams,
            vae_decoder=vae3d.VAE3DDecoder(cfg=vcfg) if vparams else None,
            vae_params=vparams, vae_cfg=vcfg, **kwargs,
        )
    raise ValueError(f"unknown family {family!r}")
