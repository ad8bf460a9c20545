"""SD1.5 UNet denoiser (Flax) — the Dreamshaper recipe's model.

TPU-native rebuild of diffusers `UNet2DConditionModel` as consumed by the
reference (import `src/main.py:46`; the Dreamshaper/SD1.5 4-NFE recipe
`README.md:90-107` runs `DiffusionPipeline('lykon/dreamshaper-7')` + TDM
LoRA + DPM-Solver with the SD1.5 scheduler config). Architecture per the
SD1.5 checkpoint config:

  * latent 4×64×64 (512px), block widths (320, 640, 1280, 1280)
  * down: 3× [2 ResBlocks + spatial transformer] + 1× [2 ResBlocks],
    stride-2 conv downsample between stages
  * mid: ResBlock → transformer → ResBlock
  * up: mirror with 3 ResBlocks per stage and skip concatenation
  * spatial transformer: GroupNorm → 1×1 proj_in → BasicTransformerBlock
    (LN → self-attn → LN → cross-attn to CLIP-L 768 tokens → LN → GEGLU FF)
    → 1×1 proj_out + residual
  * time: sinusoidal 320 (flip_sin_to_cos, shift 1) → MLP 1280, injected
    per-ResBlock after the first conv
  * ε-prediction, GroupNorm(32), SiLU

Internal layout NHWC (TPU conv native); public API NCHW like the rest of the
zoo. Parameter names mirror the HF module tree for safetensors porting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tdm_tpu.models import layers as L


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_widths: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    context_dim: int = 768  # CLIP-L hidden
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    # --gradient_checkpointing: rematerialize every ResBlock /
    # SpatialTransformer in the backward pass (the torch
    # unet.enable_gradient_checkpointing(), reference src/main.py:191-193)
    remat: bool = False

    @staticmethod
    def tiny() -> "UNetConfig":
        return UNetConfig(
            block_widths=(32, 64),
            layers_per_block=1,
            num_heads=2,
            context_dim=32,
            norm_groups=8,
            dtype=jnp.float32,
            attn_impl="xla",
        )


class ResBlock(nn.Module):
    """diffusers ResnetBlock2D: GN→silu→conv→(+temb proj)→GN→silu→conv + skip."""

    width: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv1")(
            nn.silu(h)
        )
        t = nn.Dense(self.width, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv2")(
            nn.silu(h)
        )
        if x.shape[-1] != self.width:
            x = nn.Conv(
                self.width, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: self-attn → cross-attn → GEGLU FF, pre-LN."""

    cfg: UNetConfig
    width: int

    @nn.compact
    def __call__(self, x, context, context_mask):
        c = self.cfg
        head_dim = self.width // c.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + L.Attention(
            heads=c.num_heads, head_dim=head_dim, dtype=c.dtype,
            qkv_bias=False, attn_impl=c.attn_impl, name="attn1",
        )(h.astype(c.dtype))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + L.Attention(
            heads=c.num_heads, head_dim=head_dim, dtype=c.dtype,
            qkv_bias=False, attn_impl=c.attn_impl, name="attn2",
        )(h.astype(c.dtype), context=context, key_mask=context_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        return x + L.FeedForward(
            mult=4, activation="geglu", dtype=c.dtype, name="ff"
        )(h.astype(c.dtype))


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel (depth 1): GN → 1×1 in → block → 1×1 out
    + residual, NHWC→tokens→NHWC."""

    cfg: UNetConfig
    width: int

    @nn.compact
    def __call__(self, x, context, context_mask):
        c = self.cfg
        b, hh, ww, ch = x.shape
        res = x
        h = nn.GroupNorm(c.norm_groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = nn.Dense(self.width, dtype=c.dtype, name="proj_in")(h.astype(c.dtype))
        h = h.reshape(b, hh * ww, self.width)
        h = TransformerBlock(cfg=c, width=self.width, name="transformer_blocks_0")(
            h, context, context_mask
        )
        h = nn.Dense(self.width, dtype=c.dtype, name="proj_out")(h)
        return res + h.reshape(b, hh, ww, self.width)


class UNet2DCondition(nn.Module):
    """__call__(latent [B,4,H,W], t [B], context [B,L,768], mask [B,L])
    → ε [B,4,H,W]."""

    cfg: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(self, latent, t, context, context_mask=None):
        c = self.cfg
        widths = list(c.block_widths)
        n_stages = len(widths)
        temb_dim = widths[0] * 4

        # remat wrapping preserves module names → converted checkpoints and
        # the kohya LoRA key map are layout-identical either way
        Res = nn.remat(ResBlock) if c.remat else ResBlock
        Spatial = nn.remat(SpatialTransformer) if c.remat else SpatialTransformer

        x = jnp.transpose(latent, (0, 2, 3, 1)).astype(c.dtype)
        context = context.astype(c.dtype)

        # time embedding: diffusers Timesteps(320, flip_sin_to_cos=True,
        # downscale_freq_shift=0) → TimestepEmbedding MLP to 1280
        t_base = L.sinusoidal_timestep_embedding(
            t, widths[0], flip_sin_to_cos=True, downscale_freq_shift=0.0
        )
        temb = L.TimestepEmbedding(temb_dim, dtype=c.dtype, name="time_embedding")(
            t_base.astype(c.dtype)
        )

        x = nn.Conv(widths[0], (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        skips = [x]

        # ---- down ----
        for i, w in enumerate(widths):
            has_attn = i < n_stages - 1  # last stage is DownBlock2D (no attn)
            for j in range(c.layers_per_block):
                x = Res(w, c.norm_groups, c.dtype,
                             name=f"down_{i}_res_{j}")(x, temb)
                if has_attn:
                    x = Spatial(cfg=c, width=w,
                                           name=f"down_{i}_attn_{j}")(
                        x, context, context_mask
                    )
                skips.append(x)
            if i < n_stages - 1:
                # diffusers Downsample2D: SYMMETRIC padding 1 (the UNet
                # config's downsample_padding=1) — the asymmetric (0,1) pad
                # belongs to the VAE encoder, not the UNet
                x = nn.Conv(w, (3, 3), strides=(2, 2), padding=1,
                            dtype=c.dtype,
                            name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid ----
        x = Res(widths[-1], c.norm_groups, c.dtype, name="mid_res_0")(x, temb)
        x = Spatial(cfg=c, width=widths[-1], name="mid_attn")(
            x, context, context_mask
        )
        x = Res(widths[-1], c.norm_groups, c.dtype, name="mid_res_1")(x, temb)

        # ---- up ----
        for i, w in enumerate(reversed(widths)):
            stage = n_stages - 1 - i
            has_attn = stage < n_stages - 1
            for j in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = Res(w, c.norm_groups, c.dtype,
                             name=f"up_{i}_res_{j}")(x, temb)
                if has_attn:
                    x = Spatial(cfg=c, width=w,
                                           name=f"up_{i}_attn_{j}")(
                        x, context, context_mask
                    )
            if stage > 0:
                b, hh, ww, ch = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(w, (3, 3), padding=1, dtype=c.dtype,
                            name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(c.norm_groups, epsilon=1e-5, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.Conv(c.out_channels, (3, 3), padding=1, dtype=c.dtype,
                    name="conv_out")(nn.silu(x))
        return jnp.transpose(x, (0, 3, 1, 2)).astype(latent.dtype)


def make_denoise_fn(model: UNet2DCondition, params):
    """DenoiseFn contract: (x, t, cond) → ε, cond = (CLIP tokens, mask)."""

    def fn(x, t, cond):
        context, mask = cond
        return model.apply({"params": params}, x, t, context, mask)

    return fn
