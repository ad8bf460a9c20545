"""VAE family (Flax): TAESD tiny autoencoders + AutoencoderKL, with tiled
decode for large images.

TPU-native rebuild of the reference's VAE surface (SURVEY.md §2 table B):
  * `AutoencoderTiny` — TAESD (`madebyollin/taesd`, `src/main.py:166`) used
    for training-time validation decode (`src/training.py:113-116`), and
    TAESD3 with `shift_factor=0.0` for the SD3 recipe (`README.md:51-52`);
    same topology, 16 latent channels.
  * `AutoencoderKL` — the SD1.5/PixArt full VAE (`src/main.py:46` import;
    decode path of every pipeline).
  * tiled decode — replaces diffusers `enable_tiling()/enable_slicing()`
    (`README.md:117-118`): decode overlapping spatial tiles and blend, so
    1024px decode stays within HBM. (The CogVideoX 3D VAE lives in
    `vae3d.py`.)

Layout: public API is NCHW (diffusers convention); convs run NHWC inside
(TPU-native layout). Training is image-free so `encode` exists only for API
completeness.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# TAESD (AutoencoderTiny)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TAESDConfig:
    latent_channels: int = 4  # 16 for TAESD3
    image_channels: int = 3
    width: int = 64
    num_stages: int = 3  # 8× spatial factor
    blocks_per_stage: int = 3
    scaling_factor: float = 1.0
    shift_factor: float = 0.0  # README.md:52 sets 0.0 for TAESD3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def taesd3() -> "TAESDConfig":
        return TAESDConfig(latent_channels=16)


class _TinyBlock(nn.Module):
    """conv-relu-conv-relu-conv + skip, fused ReLU (TAESD Block)."""

    width: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv_1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv_2")(h)
        if x.shape[-1] != self.width:
            x = nn.Conv(
                self.width, (1, 1), use_bias=False, dtype=self.dtype, name="skip"
            )(x)
        return nn.relu(h + x)


class TAESDDecoder(nn.Module):
    cfg: TAESDConfig

    @nn.compact
    def __call__(self, z):
        """z [B, C_lat, h, w] → image [B, 3, 8h, 8w] in [0, 1]."""
        c = self.cfg
        x = jnp.transpose(z, (0, 2, 3, 1)).astype(c.dtype)
        x = jnp.tanh(x / 3.0) * 3.0  # TAESD Clamp
        x = nn.Conv(c.width, (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        x = nn.relu(x)
        for s in range(c.num_stages):
            for b in range(c.blocks_per_stage):
                x = _TinyBlock(c.width, c.dtype, name=f"stage_{s}_block_{b}")(x)
            bsz, h, w, ch = x.shape
            x = jax.image.resize(x, (bsz, h * 2, w * 2, ch), "nearest")
            x = nn.Conv(
                c.width,
                (3, 3),
                padding=1,
                use_bias=False,
                dtype=c.dtype,
                name=f"stage_{s}_conv",
            )(x)
        x = _TinyBlock(c.width, c.dtype, name="block_out")(x)
        x = nn.Conv(c.image_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class TAESDEncoder(nn.Module):
    cfg: TAESDConfig

    @nn.compact
    def __call__(self, img):
        """image [B, 3, H, W] → z [B, C_lat, H/8, W/8]."""
        c = self.cfg
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(c.dtype)
        x = nn.Conv(c.width, (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        x = _TinyBlock(c.width, c.dtype, name="block_in")(x)
        for s in range(c.num_stages):
            x = nn.Conv(
                c.width,
                (3, 3),
                strides=(2, 2),
                padding=1,
                use_bias=False,
                dtype=c.dtype,
                name=f"stage_{s}_down",
            )(x)
            for b in range(c.blocks_per_stage):
                x = _TinyBlock(c.width, c.dtype, name=f"stage_{s}_block_{b}")(x)
        x = nn.Conv(c.latent_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out")(x)
        return jnp.transpose(x, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# AutoencoderKL (SD-family full VAE)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class KLVAEConfig:
    latent_channels: int = 4
    image_channels: int = 3
    block_widths: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215  # SD1.5; SD3 uses 1.5305 + shift 0.0609
    shift_factor: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sd3() -> "KLVAEConfig":
        return KLVAEConfig(
            latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609
        )

    @staticmethod
    def tiny() -> "KLVAEConfig":
        return KLVAEConfig(block_widths=(8, 16), norm_groups=4)


class _ResBlock(nn.Module):
    width: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv1")(
            nn.silu(h)
        )
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype, name="conv2")(
            nn.silu(h)
        )
        if x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class _MidAttention(nn.Module):
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        from tdm_tpu.ops.attention import attention as fused_attention

        out = fused_attention(q[:, None], k[:, None], v[:, None], impl="xla")[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class KLDecoder(nn.Module):
    cfg: KLVAEConfig

    @nn.compact
    def __call__(self, z):
        """z [B, C_lat, h, w] (already un-scaled) → image [B, 3, H, W] in [-1,1]."""
        c = self.cfg
        widths = list(c.block_widths)
        x = jnp.transpose(z, (0, 2, 3, 1)).astype(c.dtype)
        # diffusers AutoencoderKL applies a 1×1 post_quant_conv before the
        # decoder proper (identity-shaped; ported from checkpoints)
        x = nn.Conv(
            c.latent_channels, (1, 1), dtype=c.dtype, name="post_quant_conv"
        )(x)
        x = nn.Conv(widths[-1], (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        x = _ResBlock(widths[-1], c.norm_groups, c.dtype, name="mid_block_1")(x)
        x = _MidAttention(c.norm_groups, c.dtype, name="mid_attn")(x)
        x = _ResBlock(widths[-1], c.norm_groups, c.dtype, name="mid_block_2")(x)
        for i, wdt in enumerate(reversed(widths)):
            for j in range(c.layers_per_block + 1):
                x = _ResBlock(wdt, c.norm_groups, c.dtype, name=f"up_{i}_res_{j}")(x)
            if i < len(widths) - 1:
                b, hh, ww, ch = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, ch), "nearest")
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=c.dtype, name=f"up_{i}_conv"
                )(x)
        x = nn.GroupNorm(c.norm_groups, epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.Conv(
            c.image_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out"
        )(nn.silu(x))
        return jnp.transpose(x, (0, 3, 1, 2))


class KLEncoder(nn.Module):
    cfg: KLVAEConfig

    @nn.compact
    def __call__(self, img):
        """image [B,3,H,W] in [-1,1] → (mean, logvar) each [B, C_lat, H/f, W/f]."""
        c = self.cfg
        widths = list(c.block_widths)
        x = jnp.transpose(img, (0, 2, 3, 1)).astype(c.dtype)
        x = nn.Conv(widths[0], (3, 3), padding=1, dtype=c.dtype, name="conv_in")(x)
        for i, wdt in enumerate(widths):
            for j in range(c.layers_per_block):
                x = _ResBlock(wdt, c.norm_groups, c.dtype, name=f"down_{i}_res_{j}")(x)
            if i < len(widths) - 1:
                x = nn.Conv(
                    wdt,
                    (3, 3),
                    strides=(2, 2),
                    padding=((0, 1), (0, 1)),
                    dtype=c.dtype,
                    name=f"down_{i}_conv",
                )(x)
        x = _ResBlock(widths[-1], c.norm_groups, c.dtype, name="mid_block_1")(x)
        x = _MidAttention(c.norm_groups, c.dtype, name="mid_attn")(x)
        x = _ResBlock(widths[-1], c.norm_groups, c.dtype, name="mid_block_2")(x)
        x = nn.GroupNorm(c.norm_groups, epsilon=1e-6, dtype=jnp.float32, name="norm_out")(x)
        x = nn.Conv(
            2 * c.latent_channels, (3, 3), padding=1, dtype=c.dtype, name="conv_out"
        )(nn.silu(x))
        # diffusers' 1×1 quant_conv over the (mean, logvar) stack
        x = nn.Conv(
            2 * c.latent_channels, (1, 1), dtype=c.dtype, name="quant_conv"
        )(x)
        x = jnp.transpose(x, (0, 3, 1, 2))
        mean, logvar = jnp.split(x, 2, axis=1)
        return mean, logvar


def unscale_latents(z: jnp.ndarray, scaling_factor: float, shift_factor: float = 0.0):
    """Model-space latents → VAE-space: z/scale + shift (the
    `latents / vae.config.scaling_factor` of `src/training.py:113-115`,
    plus SD3's shift_factor)."""
    return z / scaling_factor + shift_factor


def tiled_decode(
    decode_fn,
    z: jnp.ndarray,
    *,
    tile: int = 64,
    overlap: int = 8,
    spatial_factor: int = 8,
) -> jnp.ndarray:
    """Decode [B,C,h,w] latents in overlapping spatial tiles and blend —
    the diffusers `enable_tiling()` replacement. `tile`/`overlap` are in
    latent pixels; tiles are decoded independently (bounded HBM) and
    linearly cross-faded in image space."""
    b, c, h, w = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)
    stride = tile - overlap
    f = spatial_factor
    out = None
    weight = None
    ys = list(range(0, max(h - overlap, 1), stride))
    xs = list(range(0, max(w - overlap, 1), stride))
    for yi in ys:
        y0 = min(yi, h - tile) if h >= tile else 0
        for xi in xs:
            x0 = min(xi, w - tile) if w >= tile else 0
            zt = jax.lax.dynamic_slice(
                z, (0, 0, y0, x0), (b, c, min(tile, h), min(tile, w))
            )
            img = decode_fn(zt)  # [B,3,tile*f,tile*f]
            if out is None:
                out = jnp.zeros((b, img.shape[1], h * f, w * f), img.dtype)
                weight = jnp.zeros((1, 1, h * f, w * f), img.dtype)
            th, tw = img.shape[2], img.shape[3]
            ramp_y = _ramp(th, overlap * f, img.dtype)
            ramp_x = _ramp(tw, overlap * f, img.dtype)
            wmask = ramp_y[:, None] * ramp_x[None, :]
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, 0, y0 * f, x0 * f), (b, img.shape[1], th, tw)
                )
                + img * wmask,
                (0, 0, y0 * f, x0 * f),
            )
            weight = jax.lax.dynamic_update_slice(
                weight,
                jax.lax.dynamic_slice(weight, (0, 0, y0 * f, x0 * f), (1, 1, th, tw))
                + wmask,
                (0, 0, y0 * f, x0 * f),
            )
    return out / jnp.maximum(weight, 1e-8)


def _ramp(size: int, fade: int, dtype) -> jnp.ndarray:
    """1 in the middle, linear 0→1 fade of width `fade` at both ends."""
    idx = jnp.arange(size, dtype=jnp.float32)
    up = jnp.clip((idx + 1) / max(fade, 1), 0, 1)
    down = jnp.clip((size - idx) / max(fade, 1), 0, 1)
    return jnp.minimum(up, down).astype(dtype)
