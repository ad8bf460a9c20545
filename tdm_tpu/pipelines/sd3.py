"""SD3-Medium pipeline — the reference's headline 4-NFE recipe.

Mirrors `StableDiffusion3Pipeline` exactly as `README.md:44-85` drives it:
TDM LoRA at adapter scale 0.125, TAESD3 VAE with `shift_factor = 0.0`,
DPM-Solver multistep on flow sigmas with `flow_shift ∈ [1, 6]`, seed 8888,
`pipe(prompt, negative_prompt, num_inference_steps=4, height=width=1024,
guidance_scale=1.0)`; teacher baseline = adapter scale 0 + 28 steps + cfg 7.

Conditioning (triple-encoder stack, pipeline-internal in diffusers):
  context = concat_seq( pad_dim(concat_dim(CLIP-L penult, CLIP-G penult),
                        → 4096), T5 sequence embeds )
  pooled  = concat(CLIP-L projected pooled 768, CLIP-G projected pooled 1280)
Training is prompt-only, so all of this can also be precomputed offline and
passed as `prompt_embeds=(context, pooled)`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from tdm_tpu.core import solvers
from tdm_tpu.models import mmdit_sd3, vae as vae_lib
from tdm_tpu.pipelines.base import DiffusionPipelineBase, PipelineOutput, to_images


class SD3Pipeline(DiffusionPipelineBase):
    family = "sd3"

    def __init__(
        self,
        transformer: mmdit_sd3.SD3Transformer2D,
        transformer_params: Any,
        *,
        vae_decoder=None,
        vae_params: Any = None,
        vae_scaling: float = 1.0,  # TAESD3; KL-SD3: 1.5305
        vae_shift: float = 0.0,  # README.md:52 pins TAESD3 shift to 0.0
        vae_range: str = "unit",
        text_encoders: Optional[dict] = None,  # {'clip_l','clip_g','t5'} each (model, params)
        tokenizers: Optional[dict] = None,
        flow_shift: float = 6.0,  # README recipe value; knob range 1-6
        max_t5_len: int = 256,
        max_clip_len: int = 77,
    ):
        super().__init__()
        self.transformer = transformer
        self.base_params = self.params = transformer_params
        self.vae_decoder = vae_decoder
        self.vae_params = vae_params
        self.vae_scaling = vae_scaling
        self.vae_shift = vae_shift
        self.vae_range = vae_range
        self.text_encoders = text_encoders or {}
        self.tokenizers = tokenizers or {}
        self.flow_shift = flow_shift
        self.max_t5_len = max_t5_len
        self.max_clip_len = max_clip_len

    def encode_prompt(self, prompts: list[str]) -> tuple[jnp.ndarray, jnp.ndarray]:
        """→ (context [B, L, 4096], pooled [B, 2048]); needs all three
        encoder+tokenizer pairs attached."""
        need = {"clip_l", "clip_g", "t5"}
        if not need <= set(self.text_encoders) or not need <= set(self.tokenizers):
            raise ValueError(
                "SD3 needs clip_l/clip_g/t5 encoders+tokenizers — or pass "
                "prompt_embeds=(context, pooled) precomputed"
            )
        ctx_dim = self.transformer.cfg.context_dim

        def build():
            mod_l = self.text_encoders["clip_l"][0]
            mod_g = self.text_encoders["clip_g"][0]
            mod_t5 = self.text_encoders["t5"][0]

            def fn(p_l, p_g, p_t5, ids_l, ids_g, ids_t5, mask_t5):
                seqs, pooleds = [], []
                for mod, p, ids in ((mod_l, p_l, ids_l), (mod_g, p_g, ids_g)):
                    out = mod.apply({"params": p}, ids)
                    # SD3 reads the PENULTIMATE hidden layer for the
                    # sequence path
                    seqs.append(out.hidden_states[-2])
                    pooleds.append(out.pooled)
                clip_seq = jnp.concatenate(seqs, axis=-1)  # [B,77,768+1280]
                clip_seq = jnp.pad(
                    clip_seq,
                    ((0, 0), (0, 0), (0, ctx_dim - clip_seq.shape[-1])),
                )
                t5_seq = mod_t5.apply({"params": p_t5}, ids_t5, mask_t5)
                context = jnp.concatenate([clip_seq, t5_seq], axis=1)
                pooled = jnp.concatenate(pooleds, axis=-1)  # [B, 2048]
                return context, pooled

            return fn

        ids_l, _ = self.tokenizers["clip_l"](prompts, max_length=self.max_clip_len)
        ids_g, _ = self.tokenizers["clip_g"](prompts, max_length=self.max_clip_len)
        ids_t5, mask_t5 = self.tokenizers["t5"](prompts, max_length=self.max_t5_len)
        enc = self._jit_component("clip_lg_t5", build)
        return enc(
            self.text_encoders["clip_l"][1],
            self.text_encoders["clip_g"][1],
            self.text_encoders["t5"][1],
            jnp.asarray(ids_l),
            jnp.asarray(ids_g),
            jnp.asarray(ids_t5),
            jnp.asarray(mask_t5),
        )

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
        height: int = 1024,
        width: int = 1024,
        seed: Optional[int] = None,
        generator: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        flow_shift: Optional[float] = None,
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

        # diffusers' num_images_per_prompt (reference README.md:103)
        prompt_embeds = self.repeat_per_prompt(
            prompt_embeds, num_images_per_prompt
        )
        uncond = self.repeat_per_prompt(uncond, num_images_per_prompt)
        shift = self.flow_shift if flow_shift is None else flow_shift
        b = jax.tree.leaves(prompt_embeds)[0].shape[0]
        lat_h, lat_w = height // 8, width // 8
        noise = self.initial_noise(
            latents,
            self.rng(seed, generator),
            (b, self.transformer.cfg.in_channels, lat_h, lat_w),
        )

        key = (num_inference_steps, lat_h, lat_w, use_cfg,
               float(guidance_scale or 1.0), float(shift), solver)
        fn = self._cached(key, lambda: self._build_sampler(*key))
        latents = fn(self.params, noise, prompt_embeds, uncond)

        if output_type == "latent" or self.vae_decoder is None:
            return PipelineOutput(images=None, latents=latents)
        dec = self._jit_component(
            "vae_decode",
            lambda: lambda p, z: to_images(
                self.vae_decoder.apply(
                    {"params": p},
                    z.astype(jnp.float32) / self.vae_scaling + self.vae_shift,
                ),
                value_range=self.vae_range,
            ),
        )
        return PipelineOutput(
            images=dec(self.vae_params, latents), latents=latents
        )

    def _build_sampler(self, steps, lat_h, lat_w, use_cfg, cfg, shift,
                       solver="dpm"):
        model = self.transformer
        grid = solvers.flow_grid(steps, flow_shift=shift)
        sample = {"dpm": solvers.sample_dpm_solver,
                  "unipc": solvers.sample_unipc}.get(solver)
        if sample is None:
            raise ValueError(f"unknown solver {solver!r} (dpm|unipc)")

        @jax.jit
        def run(params, noise, cond, uncond):
            denoise = mmdit_sd3.make_denoise_fn(model, params)
            return sample(
                denoise, grid, noise, cond,
                uncond=uncond, cfg=cfg if use_cfg else None,
            )

        return run


def default_sd3_pipeline(transformer_params, vae_params, *, cfg=None, **kw):
    """The README recipe assembly: SD3 MMDiT + TAESD3(shift 0)."""
    cfg = cfg or mmdit_sd3.MMDiTConfig()
    vae_cfg = vae_lib.TAESDConfig.taesd3()
    return SD3Pipeline(
        mmdit_sd3.SD3Transformer2D(cfg=cfg),
        transformer_params,
        vae_decoder=vae_lib.TAESDDecoder(cfg=vae_cfg),
        vae_params=vae_params,
        vae_scaling=vae_cfg.scaling_factor,
        vae_shift=0.0,
        **kw,
    )
