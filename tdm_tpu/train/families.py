"""Model-family registry for the training CLI.

The reference demo trains ONE family (PixArt-α, `src/main.py:168-176`) and
ships inference-only recipes for the rest (`README.md:44-138`). The TDM step
itself is model-agnostic — `denoise_fn(params, x, t, cond)` returns the
model's output in its schedule's NATIVE parameterization (ε for DDPM
schedules, v for v-prediction, velocity for rectified flow) with an opaque
cond pytree, and every conversion inside the step goes through the
prediction-type-aware schedule math (`predicted_origin`, `predicted_noise`,
`native_target`). That keeps zero-terminal-SNR schedules (CogVideoX) finite
— an ε-space contract would divide by α = 0 at the terminal timestep. So
this registry extends training to every family in the zoo:
`--model_family pixart|sd15|sd3|cogvideox`.

Each bundle carries everything the CLI needs that differs per family:
the Flax model, the native training schedule, the latent sample shape,
text-conditioning plumbing (embedding dim, token length, cond pytree
construction), the checkpoint converter, and parameter init.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Optional


@dataclass
class FamilyBundle:
    name: str
    model: Any  # Flax module
    schedule: Any  # NoiseSchedule, NATIVE prediction type (see module doc)
    sample_shape: tuple  # per-sample latent shape, no batch axis
    seq_len: int  # text token length the data pipeline should produce
    embed_dim: int  # text embedding dim the data pipeline should produce
    denoise_fn: Callable  # (params, x, t, cond) -> native model output
    init_params: Callable  # (rng) -> params
    cond_of: Callable  # (text [B,L,D], mask [B,L], pooled=None) -> cond pytree
    convert: Optional[Callable]  # torch state dict -> param tree
    latent_channels: int  # for the validation-decode gate (TAESD is 4-ch)


FAMILIES = ("pixart", "sd15", "sd3", "cogvideox")


def build(
    family: str,
    *,
    tiny: bool = False,
    resolution: int = 512,
    num_frames: int = 0,
    gradient_checkpointing: bool = False,
    mixed_precision: Optional[str] = None,
    allow_pooled_standin: bool = False,
    moe_experts: int = 0,
    moe_top_k: int = 2,
) -> FamilyBundle:
    """Construct the training bundle for `--model_family`.

    `resolution` is the pixel resolution (latent = resolution // 8) for the
    image families; CogVideoX uses its fixed 49-frame 480×720 geometry
    (`README.md:116-138`). `tiny` swaps in the smoke-test configs
    (TDM_TINY_MODEL=1). `mixed_precision` maps the reference's flag onto
    the denoiser's COMPUTE dtype (`src/main.py:330-338`): 'bf16' →
    bfloat16 (except tiny smoke configs, which stay f32 for the CPU test
    harness), 'no'/'fp32' → float32, 'fp16' → error (no TPU fp16; bf16 is
    the MXU-native equivalent), None → the config's own default.
    `allow_pooled_standin` opts an SD3 run into the masked-mean pooled
    stand-in when the batch carries no real CLIP pooled vectors (always
    allowed in tiny smoke mode). `moe_experts > 0` (pixart only) swaps each
    block's MLP for a top-k mixture-of-experts (models/moe.py — research
    extension; shard over an 'ep' mesh axis with `--ep`)."""
    import jax
    import jax.numpy as jnp

    from tdm_tpu.core import schedules as sched

    if family not in FAMILIES:
        raise ValueError(
            f"unknown --model_family {family!r}; choose from {FAMILIES}"
        )
    if moe_experts > 0 and family != "pixart":
        raise ValueError(
            f"--moe_experts is a pixart-family extension (got {family!r})"
        )
    lat = 8 if tiny else max(resolution // 8, 8)

    def apply_mp(mcfg):
        if mixed_precision is None:
            return mcfg
        if mixed_precision == "fp16":
            raise ValueError(
                "--mixed_precision fp16 is not supported on TPU — use bf16 "
                "(the MXU-native mixed precision fp16 recipes map to)"
            )
        if mixed_precision in ("no", "fp32"):
            return dataclasses.replace(mcfg, dtype=jnp.float32)
        if mixed_precision == "bf16":
            # tiny smoke configs keep their f32 default (CPU harness);
            # full-size configs compute in bf16
            return mcfg if tiny else dataclasses.replace(
                mcfg, dtype=jnp.bfloat16
            )
        raise ValueError(
            f"unknown --mixed_precision {mixed_precision!r} "
            "(choose bf16 / no / fp32)"
        )

    if family == "pixart":
        from tdm_tpu.io import convert
        from tdm_tpu.models import pixart

        mcfg = pixart.PixArtConfig.tiny() if tiny else pixart.PixArtConfig()
        if not tiny:
            # TRAINING runs the flash kernel even at PixArt's S=1024, where
            # inference 'auto' picks XLA: forward-only XLA wins (100 vs
            # 115 ms, the kernel pads head_dim 72→128), but the train
            # step's backward + remat recompute materializes the f32 S²
            # probs on the XLA path — measured on v5e: 3202 (xla) → 4344
            # (pallas) iters/hour, +36% (docs/PERF.md).
            mcfg = dataclasses.replace(mcfg, attn_impl="pallas")
        if not tiny and lat != mcfg.sample_size:
            mcfg = dataclasses.replace(mcfg, sample_size=lat)
        if gradient_checkpointing:
            mcfg = dataclasses.replace(mcfg, remat=True)
        if moe_experts > 0:
            mcfg = dataclasses.replace(
                mcfg, moe_experts=moe_experts, moe_top_k=moe_top_k
            )
        mcfg = apply_mp(mcfg)
        model = pixart.PixArtTransformer2D(cfg=mcfg)
        shape = (mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)

        def denoise_fn(params, x, t, cond):
            text, mask = cond
            return pixart.epsilon(
                model.apply({"params": params}, x, t, text, mask)
            )

        def init_params(rng):
            return jax.jit(model.init)(
                rng,
                jnp.zeros((1, *shape)),
                jnp.zeros((1,)),
                jnp.zeros((1, 8, mcfg.caption_dim)),
                jnp.ones((1, 8), jnp.int32),
            )["params"]

        return FamilyBundle(
            name=family,
            model=model,
            schedule=sched.ddpm_linear(),
            sample_shape=shape,
            seq_len=8 if tiny else 120,
            embed_dim=mcfg.caption_dim,
            denoise_fn=denoise_fn,
            init_params=init_params,
            cond_of=lambda text, mask, pooled=None: (text, mask),
            convert=lambda sd: convert.pixart_params(sd),
            latent_channels=mcfg.in_channels,
        )

    if family == "sd15":
        from tdm_tpu.io import convert
        from tdm_tpu.models import unet_sd15

        mcfg = unet_sd15.UNetConfig.tiny() if tiny else unet_sd15.UNetConfig()
        if gradient_checkpointing:
            mcfg = dataclasses.replace(mcfg, remat=True)
        mcfg = apply_mp(mcfg)
        model = unet_sd15.UNet2DCondition(cfg=mcfg)
        shape = (mcfg.in_channels, lat, lat)

        def denoise_fn(params, x, t, cond):
            text, mask = cond
            return model.apply({"params": params}, x, t, text, mask)

        def init_params(rng):
            return jax.jit(model.init)(
                rng,
                jnp.zeros((1, *shape)),
                jnp.zeros((1,)),
                jnp.zeros((1, 8, mcfg.context_dim)),
                jnp.ones((1, 8), jnp.int32),
            )["params"]

        return FamilyBundle(
            name=family,
            model=model,
            # SD1.5 scheduler config: scaled_linear β (README.md:97)
            schedule=sched.ddpm_scaled_linear(),
            sample_shape=shape,
            seq_len=8 if tiny else 77,
            embed_dim=mcfg.context_dim,
            denoise_fn=denoise_fn,
            init_params=init_params,
            cond_of=lambda text, mask, pooled=None: (text, mask),
            convert=lambda sd: convert.unet_sd15_params(sd),
            latent_channels=mcfg.in_channels,
        )

    if family == "sd3":
        from tdm_tpu.io import convert
        from tdm_tpu.models import mmdit_sd3

        mcfg = mmdit_sd3.MMDiTConfig.tiny() if tiny else mmdit_sd3.MMDiTConfig()
        if not tiny and lat != mcfg.sample_size:
            mcfg = dataclasses.replace(mcfg, sample_size=lat)
        if gradient_checkpointing:
            mcfg = dataclasses.replace(mcfg, remat=True)
        mcfg = apply_mp(mcfg)
        model = mmdit_sd3.SD3Transformer2D(cfg=mcfg)
        shape = (mcfg.in_channels, mcfg.sample_size, mcfg.sample_size)
        # SD3-Medium trains under a shifted rectified-flow schedule
        # (shift 3.0 — the HF scheduler config's `shift`). The model's raw
        # velocity output is passed straight through: the TDM step is
        # parameterization-aware (predicted_origin / predicted_noise /
        # native_target branch on schedule.prediction_type), so NO
        # conversion happens here — converting to ε would be singular at
        # zero terminal SNR and double-convert inside the step
        schedule = sched.flow_match(shift=3.0)

        def _pooled_of(text, mask):
            # deterministic pooled stand-in folded from the token stream:
            # masked mean, tiled/truncated to pooled_dim. A real SD3 run
            # supplies CLIP-L/G pooled vectors (pipelines/sd3.py does, and
            # `build_cache --pipeline <sd3 dir>` caches them); the stand-in
            # is FABRICATED conditioning, so full-size runs must opt in
            # explicitly — silently training a real SD3 on it would be a
            # quality bug (SD3's triple-encoder design, README.md:48).
            if not (tiny or allow_pooled_standin):
                raise ValueError(
                    "sd3 training got no pooled CLIP-L/G vectors — build "
                    "the cache with `build_cache --pipeline <sd3 dir>` (it "
                    "stores the real pooled path), or pass "
                    "--allow_pooled_standin to knowingly train on the "
                    "masked-mean T5 stand-in"
                )
            m = mask.astype(text.dtype)[..., None]
            mean = (text * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            reps = -(-mcfg.pooled_dim // mean.shape[-1])  # ceil
            return jnp.tile(mean, (1, reps))[:, : mcfg.pooled_dim]

        def denoise_fn(params, x, t, cond):
            ctx, pooled = cond
            return model.apply({"params": params}, x, t, ctx, pooled)

        def init_params(rng):
            return jax.jit(model.init)(
                rng,
                jnp.zeros((1, *shape)),
                jnp.zeros((1,)),
                jnp.zeros((1, 8, mcfg.context_dim)),
                jnp.zeros((1, mcfg.pooled_dim)),
            )["params"]

        return FamilyBundle(
            name=family,
            model=model,
            schedule=schedule,
            sample_shape=shape,
            seq_len=8 if tiny else 154,  # T5 tokens (joint context)
            embed_dim=mcfg.context_dim,
            denoise_fn=denoise_fn,
            init_params=init_params,
            cond_of=lambda text, mask, pooled=None: (
                text,
                _pooled_of(text, mask) if pooled is None else pooled,
            ),
            convert=lambda sd: convert.sd3_params(sd),
            latent_channels=mcfg.in_channels,
        )

    # cogvideox
    from tdm_tpu.io import convert
    from tdm_tpu.models import cogvideox as cog

    mcfg = cog.CogVideoXConfig.tiny() if tiny else cog.CogVideoXConfig()
    if num_frames > 0:
        # --num_frames (pixel frames, reference README.md:116's 49-frame
        # clips) → latent frames via the causal VAE's 4x temporal factor;
        # lets --sp runs pick an sp-divisible frame count
        mcfg = dataclasses.replace(
            mcfg, sample_frames=1 + (num_frames - 1) // 4
        )
    if gradient_checkpointing:
        mcfg = dataclasses.replace(mcfg, remat=True)
    mcfg = apply_mp(mcfg)
    model = cog.CogVideoXTransformer3D(cfg=mcfg)
    shape = (mcfg.in_channels, mcfg.sample_frames, mcfg.sample_h, mcfg.sample_w)
    # v-prediction, SNR-shifted, ZERO terminal SNR — raw v output passed
    # through (see the sd3 branch note: the step is parameterization-aware
    # and ε conversion would be singular at the terminal timestep)
    schedule = sched.cogvideox()

    def denoise_fn(params, x, t, cond):
        return model.apply({"params": params}, x, t, cond)

    def init_params(rng):
        import jax.numpy as jnp  # noqa: F811 (closure clarity)

        return jax.jit(model.init)(
            rng,
            jnp.zeros((1, *shape)),
            jnp.zeros((1,)),
            jnp.zeros((1, mcfg.max_text_len, mcfg.text_dim)),
        )["params"]

    def cond_of(text, mask, pooled=None):
        # CogVideoX passes no mask — fixed-length zero-padded T5 tokens
        # (`models/cogvideox.py::make_denoise_fn`); zero out padded rows
        m = mask.astype(text.dtype)[..., None]
        return text * m

    return FamilyBundle(
        name=family,
        model=model,
        schedule=schedule,
        sample_shape=shape,
        seq_len=mcfg.max_text_len,
        embed_dim=mcfg.text_dim,
        denoise_fn=denoise_fn,
        init_params=init_params,
        cond_of=cond_of,
        convert=lambda sd: convert.cogvideox_params(sd),
        latent_channels=mcfg.in_channels,
    )
