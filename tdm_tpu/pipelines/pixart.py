"""PixArt-α pipeline — 4-NFE text-to-image on the training-path flagship.

Mirrors the diffusers `PixArtAlphaPipeline` surface as the reference's
validation uses it (`src/training.py:107-121`: TDM-student few-step rollout
+ TAESD decode) and the standard pipeline verbs of §3.4. Components:
T5 encoder (or precomputed embeddings), PixArt DiT, TAESD or KL VAE.

Sampling: the trained TDM student uses the deterministic few-step rollout on
the reference grid (total_steps=900, K=4 → t=[899,674,449,224]); `solver=
'dpm'` runs DPM-Solver++(2M) over the full schedule instead (teacher-style
multistep sampling).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from tdm_tpu.core import sampling, schedules as sched, solvers
from tdm_tpu.models import pixart, vae as vae_lib
from tdm_tpu.pipelines.base import DiffusionPipelineBase, PipelineOutput, to_images


class PixArtPipeline(DiffusionPipelineBase):
    family = "pixart"

    def __init__(
        self,
        transformer: pixart.PixArtTransformer2D,
        transformer_params: Any,
        *,
        vae_decoder=None,
        vae_params: Any = None,
        vae_scaling: float = 1.0,
        vae_range: str = "unit",  # TAESD decodes to [0,1]
        text_encoder=None,
        text_encoder_params: Any = None,
        tokenizer=None,
        schedule: Optional[sched.NoiseSchedule] = None,
        max_text_len: int = 120,  # reference src/main.py:417-421
    ):
        super().__init__()
        self.transformer = transformer
        self.base_params = self.params = transformer_params
        self.vae_decoder = vae_decoder
        self.vae_params = vae_params
        self.vae_scaling = vae_scaling
        self.vae_range = vae_range
        self.text_encoder = text_encoder
        self.text_encoder_params = text_encoder_params
        self.tokenizer = tokenizer
        self.schedule = schedule if schedule is not None else sched.ddpm_linear()
        self.max_text_len = max_text_len

    # ---- conditioning ----

    def encode_prompt(self, prompts: list[str]) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Tokenize + T5-encode (reference `src/main.py:417-430,458-461`).
        Requires tokenizer + text encoder; otherwise pass `prompt_embeds`."""
        if self.tokenizer is None or self.text_encoder is None:
            raise ValueError(
                "no tokenizer/text_encoder attached — pass prompt_embeds="
                "(embeds, mask) instead of raw prompts"
            )
        ids, mask = self.tokenizer(prompts, max_length=self.max_text_len)
        enc = self._jit_component(
            "t5",
            lambda: lambda p, i, m: self.text_encoder.apply({"params": p}, i, m),
        )
        embeds = enc(
            self.text_encoder_params, jnp.asarray(ids), jnp.asarray(mask)
        )
        return embeds, jnp.asarray(mask)

    # ---- the call contract (§3.4) ----

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
        solver: str = "fewstep",
        total_steps: int = 900,
        output_type: str = "image",
    ) -> PipelineOutput:
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt)
        cond = prompt_embeds
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

        # diffusers' num_images_per_prompt (reference README.md:103)
        cond = self.repeat_per_prompt(cond, num_images_per_prompt)
        uncond = self.repeat_per_prompt(uncond, num_images_per_prompt)
        b = jax.tree.leaves(cond)[0].shape[0]
        lat_h, lat_w = height // 8, width // 8
        noise = self.initial_noise(
            latents, self.rng(seed, generator), (b, 4, lat_h, lat_w)
        )

        key = (solver, num_inference_steps, lat_h, lat_w, use_cfg,
               float(guidance_scale or 1.0), total_steps)
        fn = self._cached(key, lambda: self._build_sampler(*key))
        latents = fn(self.params, noise, cond, uncond)

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

    def _build_sampler(self, solver, steps, lat_h, lat_w, use_cfg, cfg, total_steps):
        # params flow in as a jit ARGUMENT: closed-over full-size weights
        # would embed gigabytes of HLO constants (see bench.py perf notes)
        model = self.transformer
        schedule = self.schedule
        if solver == "fewstep":
            grid = sched.fewstep_grid(total_steps, steps)

            @jax.jit
            def run(params, noise, cond, uncond):
                denoise = pixart.make_denoise_fn(model, params)
                return sampling.sample_fewstep(
                    denoise, schedule, noise, cond,
                    timestep_grid=grid,
                    uncond=uncond, cfg=cfg if use_cfg else None,
                )

        elif solver in ("dpm", "unipc"):
            grid = solvers.ddpm_grid(schedule, steps)
            sample = (
                solvers.sample_dpm_solver if solver == "dpm"
                else solvers.sample_unipc
            )

            @jax.jit
            def run(params, noise, cond, uncond):
                denoise = pixart.make_denoise_fn(model, params)
                return sample(
                    denoise, grid, noise, cond,
                    uncond=uncond, cfg=cfg if use_cfg else None,
                )

        else:
            raise ValueError(f"unknown solver {solver!r} (fewstep|dpm|unipc)")
        return run


def default_pixart_pipeline(
    transformer_params, vae_params, *, cfg=None, vae_cfg=None, **kw
) -> PixArtPipeline:
    """Assemble the reference validation setup: full PixArt DiT + TAESD
    (`src/main.py:166`, `src/training.py:113`)."""
    cfg = cfg or pixart.PixArtConfig()
    vae_cfg = vae_cfg or vae_lib.TAESDConfig()
    return PixArtPipeline(
        pixart.PixArtTransformer2D(cfg=cfg),
        transformer_params,
        vae_decoder=vae_lib.TAESDDecoder(cfg=vae_cfg),
        vae_params=vae_params,
        vae_scaling=vae_cfg.scaling_factor,
        **kw,
    )
