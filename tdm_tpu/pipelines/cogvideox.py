"""CogVideoX pipeline — 4-NFE text-to-video.

Mirrors `CogVideoXPipeline` as the reference drives it (`README.md:114-138`):
TDM LoRA, `vae.enable_slicing()/enable_tiling()` (here: tiled decode),
seed 8888, `pipe(prompt, guidance_scale=1, num_inference_steps=4,
num_frames=49)`. The TDM generator was trained on the custom grid
t = [999, 856, 665, 399] (`README.md:129`) — that grid is the default here
(the README notes the stock sampler's uniform grid is a known mismatch,
`README.md:130-132`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from tdm_tpu.core import sampling, schedules as sched
from tdm_tpu.models import cogvideox as cog, vae3d
from tdm_tpu.pipelines.base import DiffusionPipelineBase, PipelineOutput, to_images

TDM_TRAINED_GRID = (999, 856, 665, 399)  # README.md:129


class CogVideoXPipeline(DiffusionPipelineBase):
    family = "cogvideox"

    def __init__(
        self,
        transformer: cog.CogVideoXTransformer3D,
        transformer_params: Any,
        *,
        vae_decoder: Optional[vae3d.VAE3DDecoder] = None,
        vae_params: Any = None,
        vae_cfg: Optional[vae3d.VAE3DConfig] = None,
        text_encoder=None,
        text_encoder_params: Any = None,
        tokenizer=None,
        schedule: Optional[sched.NoiseSchedule] = None,
        vae_tile: int = 32,
        vae_tile_overlap: int = 4,
        vae_temporal_chunk: Optional[int] = None,
        sequence_parallel_mesh=None,
    ):
        """`sequence_parallel_mesh`: a jax Mesh whose axis named by the
        transformer cfg's `sequence_parallel_axis` shards the latent FRAME
        axis — videos longer than one chip's HBM run ring-attended across
        the mesh (models/cogvideox.sequence_parallel_apply). The latent
        frame count must divide by the sp axis size.

        `vae_temporal_chunk`: latent frames per VAE-decode call — the
        reference's `vae.enable_slicing()` (README.md:117-118). Conv caches
        carry across chunks (vae3d.decode_streaming), so the output is the
        monolithic decode with peak activation HBM bounded by the chunk.
        Composes with the spatial tiling (enable_tiling analog): each
        spatial tile streams its frames."""
        super().__init__()
        self.transformer = transformer
        self.base_params = self.params = transformer_params
        self.vae_decoder = vae_decoder
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg or vae3d.VAE3DConfig()
        self.text_encoder = text_encoder
        self.text_encoder_params = text_encoder_params
        self.tokenizer = tokenizer
        self.schedule = schedule if schedule is not None else sched.cogvideox()
        self.vae_tile = vae_tile
        self.vae_tile_overlap = vae_tile_overlap
        self.vae_temporal_chunk = vae_temporal_chunk
        self.sp_mesh = sequence_parallel_mesh
        ax = transformer.cfg.sequence_parallel_axis
        if (sequence_parallel_mesh is None) != (ax is None):
            raise ValueError(
                "sequence_parallel_mesh and the transformer cfg's "
                "sequence_parallel_axis must be set together "
                f"(mesh={sequence_parallel_mesh}, axis={ax!r})"
            )

    def encode_prompt(self, prompts: list[str]) -> jnp.ndarray:
        if self.tokenizer is None or self.text_encoder is None:
            raise ValueError("no tokenizer/text_encoder — pass prompt_embeds")
        ids, mask = self.tokenizer(
            prompts, max_length=self.transformer.cfg.max_text_len
        )
        enc = self._jit_component(
            "t5",
            lambda: lambda p, i, m: self.text_encoder.apply({"params": p}, i, m),
        )
        return enc(
            self.text_encoder_params, jnp.asarray(ids), jnp.asarray(mask)
        )

    def __call__(
        self,
        prompt: Optional[list[str]] = None,
        *,
        negative_prompt: Optional[list[str]] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_embeds: Optional[jnp.ndarray] = None,
        num_inference_steps: int = 4,
        num_videos_per_prompt: int = 1,
        guidance_scale: float = 1.0,
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        seed: Optional[int] = None,
        generator: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        timesteps: Optional[Sequence[int]] = None,
        output_type: str = "video",
    ) -> PipelineOutput:
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt)
        negative_prompt = self.check_negative_prompt(
            negative_prompt, prompt_embeds.shape[0]
        )
        use_cfg = guidance_scale is not None and guidance_scale > 1.0
        uncond = negative_embeds if use_cfg else None
        if use_cfg and uncond is None:
            if self.tokenizer is not None and self.text_encoder is not None:
                # diffusers CogVideoXPipeline encodes the (default-empty)
                # negative prompt; fall back to a zero embedding only when
                # no encoder is attached (cached-embeds serving)
                uncond = self.encode_prompt(
                    negative_prompt
                    if negative_prompt is not None
                    else [""] * prompt_embeds.shape[0]
                )
            else:
                uncond = jnp.zeros_like(prompt_embeds)

        # diffusers CogVideoXPipeline's num_videos_per_prompt (the video
        # analog of README.md:103's num_images_per_prompt)
        prompt_embeds = self.repeat_per_prompt(
            prompt_embeds, num_videos_per_prompt
        )
        uncond = self.repeat_per_prompt(uncond, num_videos_per_prompt)
        c = self.vae_cfg
        f_lat = 1 + (num_frames - 1) // c.temporal_factor
        lat_h, lat_w = height // c.spatial_factor, width // c.spatial_factor
        b = prompt_embeds.shape[0]
        noise = self.initial_noise(
            latents,
            self.rng(seed, generator),
            (b, self.transformer.cfg.in_channels, f_lat, lat_h, lat_w),
        )

        if timesteps is None:
            timesteps = (
                TDM_TRAINED_GRID
                if num_inference_steps == 4
                else tuple(
                    int(t)
                    for t in sched.fewstep_grid(1000, num_inference_steps).tolist()
                )
            )
        if self.sp_mesh is not None and self.data_parallel_mesh is not None:
            raise ValueError(
                "sequence_parallel_mesh and data_parallel_mesh are mutually "
                "exclusive on one pipeline — use a single ('data','sp') "
                "mesh via sequence_parallel_mesh (its 'data' axis already "
                "shards the batch)"
            )
        if self.sp_mesh is not None and self.tensor_parallel_mesh is not None:
            raise ValueError(
                "sequence_parallel_mesh and tensor_parallel_mesh are "
                "mutually exclusive as separate knobs — to COMPOSE them, "
                "pass ONE ('data','sp','tp') mesh as sequence_parallel_mesh: "
                "the 'tp' axis stays automatic inside the shard_map and the "
                "params are megatron-sharded over it"
            )
        key = (tuple(timesteps), f_lat, lat_h, lat_w, use_cfg,
               float(guidance_scale or 1.0))
        fn = self._cached(key, lambda: self._build_sampler(*key))
        params = self.params
        if self.sp_mesh is not None and "tp" in self.sp_mesh.axis_names:
            # sp+tp composition: 'tp' is an AUTO axis inside the shard_map
            # (models/cogvideox.sequence_parallel_apply), so megatron-
            # placing the params shards every projection within each
            # sequence shard. Cached like the serving-tp path.
            from tdm_tpu.parallel import tp as tp_lib

            tdef = jax.tree.structure(params)
            cache = self._tp_shardings_cache
            if cache is not None and cache[0] is self.sp_mesh and cache[1] == tdef:
                shardings = cache[2]
            else:
                shardings = tp_lib.tp_shardings(params, self.sp_mesh)
                self._tp_shardings_cache = (self.sp_mesh, tdef, shardings)
            params = jax.device_put(params, shardings)
        latents = fn(params, noise, prompt_embeds, uncond)

        if output_type == "latent" or self.vae_decoder is None:
            return PipelineOutput(images=None, latents=latents)
        # one jitted per-tile decode, reused across every tile (all interior
        # tiles share one shape, so one compile serves the whole sweep);
        # with vae_temporal_chunk set each tile additionally streams its
        # frames through the conv-cache path (decode_streaming's _stream_
        # chunk jits are module-level and shape-keyed, likewise reused)
        if self.vae_temporal_chunk is not None:
            decode = lambda z: vae3d.decode_streaming(
                self.vae_decoder, self.vae_params, z,
                chunk=self.vae_temporal_chunk,
            )
        else:
            tile_dec = self._jit_component(
                "vae3d_tile",
                lambda: lambda p, z: self.vae_decoder.apply({"params": p}, z),
            )
            decode = lambda z: tile_dec(self.vae_params, z)
        video = vae3d.decode_tiled(
            decode,
            latents.astype(jnp.float32) / c.scaling_factor,
            tile=self.vae_tile,
            overlap=self.vae_tile_overlap,
            spatial_factor=c.spatial_factor,
        )
        return PipelineOutput(
            images=to_images(video, value_range="pm1"), latents=latents
        )

    def _build_sampler(self, timesteps, f_lat, lat_h, lat_w, use_cfg, cfg):
        model = self.transformer
        grid = sched.grid_from_list(list(timesteps))
        schedule = self.schedule
        sp_fn = None
        if self.sp_mesh is not None:
            ax = model.cfg.sequence_parallel_axis
            n_sp = dict(self.sp_mesh.shape)[ax]
            if f_lat % n_sp != 0:
                raise ValueError(
                    f"latent frame count {f_lat} does not divide by the "
                    f"'{ax}' axis size {n_sp} — pick num_frames so that "
                    f"1 + (num_frames-1)/temporal_factor is a multiple"
                )
            data_ax = "data" if "data" in self.sp_mesh.axis_names else None
            sp_fn = cog.sequence_parallel_apply(
                model, self.sp_mesh, data_axis=data_ax
            )

        @jax.jit
        def run(params, noise, cond, uncond):
            if sp_fn is not None:
                denoise = lambda x, t, c: sp_fn(params, x, t, c)
            else:
                denoise = cog.make_denoise_fn(model, params)
            return sampling.sample_fewstep(
                denoise, schedule, noise, cond,
                timestep_grid=grid,
                uncond=uncond, cfg=cfg if use_cfg else None,
            )

        return run
