"""SD1.5 / Dreamshaper pipeline — the reference's simplest 4-NFE recipe.

Mirrors `DiffusionPipeline.from_pretrained('lykon/dreamshaper-7')` + TDM
LoRA + DPM-Solver(SD1.5 config) + `pipe(prompt, num_inference_steps=4,
guidance_scale=1, seed 317)` (reference `README.md:90-107`). Components:
CLIP-L text encoder, SD1.5 UNet, KL VAE.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from tdm_tpu.core import schedules as sched, solvers
from tdm_tpu.models import clip as clip_mod, unet_sd15
from tdm_tpu.pipelines.base import DiffusionPipelineBase, PipelineOutput, to_images


class SD15Pipeline(DiffusionPipelineBase):
    family = "sd15"

    def __init__(
        self,
        unet: unet_sd15.UNet2DCondition,
        unet_params: Any,
        *,
        vae_decoder=None,
        vae_params: Any = None,
        vae_scaling: float = 0.18215,
        vae_range: str = "pm1",
        text_encoder: Optional[clip_mod.CLIPTextEncoder] = None,
        text_encoder_params: Any = None,
        tokenizer=None,
        schedule: Optional[sched.NoiseSchedule] = None,
        max_text_len: int = 77,
    ):
        super().__init__()
        self.unet = unet
        self.base_params = self.params = unet_params
        self.vae_decoder = vae_decoder
        self.vae_params = vae_params
        self.vae_scaling = vae_scaling
        self.vae_range = vae_range
        self.text_encoder = text_encoder
        self.text_encoder_params = text_encoder_params
        self.tokenizer = tokenizer
        # SD1.5 scheduler config: scaled_linear β ∈ [0.00085, 0.012]
        self.schedule = (
            schedule if schedule is not None else sched.ddpm_scaled_linear()
        )
        self.max_text_len = max_text_len

    def encode_prompt(self, prompts: list[str]) -> tuple[jnp.ndarray, jnp.ndarray]:
        if self.tokenizer is None or self.text_encoder is None:
            raise ValueError(
                "no tokenizer/text_encoder attached — pass prompt_embeds"
            )
        ids, mask = self.tokenizer(prompts, max_length=self.max_text_len)
        enc = self._jit_component(
            "clip",
            lambda: lambda p, i: self.text_encoder.apply(
                {"params": p}, i
            ).last_hidden_state,
        )
        out = enc(self.text_encoder_params, jnp.asarray(ids))
        return out, jnp.asarray(mask)

    def __call__(
        self,
        prompt: Optional[list[str]] = None,
        *,
        negative_prompt: Optional[list[str]] = None,
        prompt_embeds: Optional[tuple] = None,
        negative_embeds: Optional[tuple] = None,
        num_inference_steps: int = 4,
        num_images_per_prompt: int = 1,
        guidance_scale: float = 1.0,
        height: int = 512,
        width: int = 512,
        seed: Optional[int] = None,
        generator: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        solver: str = "dpm",
        output_type: str = "image",
    ) -> PipelineOutput:
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt)
        negative_prompt = self.check_negative_prompt(
            negative_prompt, jax.tree.leaves(prompt_embeds)[0].shape[0]
        )
        use_cfg = guidance_scale is not None and guidance_scale > 1.0
        uncond = None
        if use_cfg:
            if negative_embeds is None:
                negative_embeds = self.encode_prompt(
                    negative_prompt
                    if negative_prompt is not None
                    else [""] * len(prompt)
                )
            uncond = negative_embeds

        # reference README.md:103 (Dreamshaper recipe): N images per prompt
        prompt_embeds = self.repeat_per_prompt(
            prompt_embeds, num_images_per_prompt
        )
        uncond = self.repeat_per_prompt(uncond, num_images_per_prompt)
        b = jax.tree.leaves(prompt_embeds)[0].shape[0]
        lat_h, lat_w = height // 8, width // 8
        noise = self.initial_noise(
            latents, self.rng(seed, generator), (b, 4, lat_h, lat_w)
        )

        key = (num_inference_steps, lat_h, lat_w, use_cfg,
               float(guidance_scale or 1.0), solver)
        fn = self._cached(key, lambda: self._build_sampler(*key))
        latents = fn(self.params, noise, prompt_embeds, uncond)

        if output_type == "latent" or self.vae_decoder is None:
            return PipelineOutput(images=None, latents=latents)
        dec = self._jit_component(
            "vae_decode",
            lambda: lambda p, z: to_images(
                self.vae_decoder.apply(
                    {"params": p}, z.astype(jnp.float32) / self.vae_scaling
                ),
                value_range=self.vae_range,
            ),
        )
        return PipelineOutput(
            images=dec(self.vae_params, latents), latents=latents
        )

    def _build_sampler(self, steps, lat_h, lat_w, use_cfg, cfg,
                       solver="dpm"):
        model = self.unet
        grid = solvers.ddpm_grid(self.schedule, steps)
        sample = {"dpm": solvers.sample_dpm_solver,
                  "unipc": solvers.sample_unipc}.get(solver)
        if sample is None:
            raise ValueError(f"unknown solver {solver!r} (dpm|unipc)")

        @jax.jit
        def run(params, noise, cond, uncond):
            denoise = unet_sd15.make_denoise_fn(model, params)
            return sample(
                denoise, grid, noise, cond,
                uncond=uncond, cfg=cfg if use_cfg else None,
            )

        return run
