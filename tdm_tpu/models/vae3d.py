"""CogVideoX 3D causal VAE (Flax) — video latent decode/encode.

TPU-native rebuild of diffusers `AutoencoderKLCogVideoX` as the reference
consumes it: `pipe.vae.enable_slicing()` / `enable_tiling()` for the 49-frame
decode (`README.md:117-118`), 4× temporal / 8× spatial compression
(49 frames ↔ 13 latent frames via F_out = (F_lat - 1)·4 + 1).

Structure (THUDM/CogVideoX-2b VAE config):
  * all convs are CAUSAL in time: front-pad (k_t − 1) frames by replicating
    the first frame, so frame i never sees frames > i — this is what makes
    frame-sliced decoding exact, not an approximation
  * decoder: conv_in → 2 mid ResBlocks → 4 up stages (3 ResBlocks each,
    widths 512→256→256→128), spatial ×2 upsample per stage (last 3),
    temporal ×2 upsample in the middle two stages ((F−1)·2+1 keeps the
    leading frame unpaired), GroupNorm(32) + SiLU, no attention
  * encoder mirrors with strided causal convs
  * latents scaled by `scaling_factor` (CogVideoX: 1.15258426)

Memory modes replacing diffusers' flags:
  * `decode_tiled(...)` — overlapping SPATIAL tiles blended in pixel space
    (bounded HBM for 480×720+), same approach as `vae.tiled_decode`
  * `decode_streaming(...)` — TEMPORAL chunks with carried conv caches
    (the reference's `enable_slicing` analog, `README.md:117-118`): every
    CausalConv3d stores its last k_t−1 input frames in a flax 'cache'
    collection, so chunk k needs NO recompute of earlier frames and the
    result is exactly the monolithic decode (causality makes the carried
    context sufficient, test_vae3d.py::test_streaming_decode_exact)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class VAE3DConfig:
    latent_channels: int = 16
    image_channels: int = 3
    block_widths: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_groups: int = 32
    scaling_factor: float = 1.15258426
    temporal_factor: int = 4
    spatial_factor: int = 8
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny() -> "VAE3DConfig":
        return VAE3DConfig(
            block_widths=(8, 16), layers_per_block=1, norm_groups=4,
            temporal_factor=2, spatial_factor=2,
        )


class SpatialGroupNorm(nn.Module):
    """GroupNorm over (H, W, channel-group) PER FRAME — flax's GroupNorm on
    a [B,F,H,W,C] tensor would reduce over the frame axis too, coupling
    frames and silently breaking temporal causality (CogVideoX applies its
    norms per frame)."""

    groups: int

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="gn")(
            x.reshape(b * f, h, w, c)
        )
        return y.reshape(b, f, h, w, c).astype(x.dtype)


class CausalConv3d(nn.Module):
    """3D conv, SAME spatial padding, CAUSAL temporal padding (front-pad
    k_t−1 frames replicating frame 0 — matches CogVideoX's conv cache
    semantics at sequence start).

    Streaming mode (`streaming=True`): the k_t−1 front-context frames live
    in a flax 'cache' variable — the FIRST chunk replicate-pads exactly
    like the monolithic path, every later chunk reads the previous chunk's
    input tail, so a temporally chunked decode is exactly the monolithic
    decode (diffusers CogVideoXCausalConv3d.fake_context_parallel_forward's
    conv_cache, consumed by `enable_slicing`, README.md:117-118)."""

    width: int
    kernel: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True):
        """x [B, F, H, W, C] → [B, F', H', W', C']."""
        kt, kh, kw = self.kernel
        if kt > 1:
            if streaming:
                ctx = self.variable(
                    "cache", "ctx",
                    lambda: jnp.zeros(
                        (x.shape[0], kt - 1) + x.shape[2:], x.dtype
                    ),
                )
                front = (
                    jnp.repeat(x[:, :1], kt - 1, axis=1)
                    if first_chunk
                    else ctx.value
                )
                x = jnp.concatenate([front, x], axis=1)
                if not self.is_initializing():
                    ctx.value = x[:, -(kt - 1):]
            else:
                front = jnp.repeat(x[:, :1], kt - 1, axis=1)
                x = jnp.concatenate([front, x], axis=1)
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        return nn.Conv(
            self.width,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=((0, 0), pad_h, pad_w),
            dtype=self.dtype,
            name="conv",
        )(x)


class ResBlock3D(nn.Module):
    width: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True):
        kw = dict(streaming=streaming, first_chunk=first_chunk)
        h = SpatialGroupNorm(self.groups, name="norm1")(x)
        h = CausalConv3d(self.width, dtype=self.dtype, name="conv1")(nn.silu(h), **kw)
        h = SpatialGroupNorm(self.groups, name="norm2")(h)
        h = CausalConv3d(self.width, dtype=self.dtype, name="conv2")(nn.silu(h), **kw)
        if x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


def _upsample_spatial(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def _upsample_temporal(x, first_chunk: bool = True):
    """(F−1)·2+1 frames: the GLOBAL frame 0 stays single, every other frame
    doubles — preserves the causal '1 + k·factor' frame structure. In a
    streaming chunk after the first, frame 0 already happened, so every
    frame of the chunk doubles."""
    if not first_chunk:
        return jnp.repeat(x, 2, axis=1)
    first, rest = x[:, :1], x[:, 1:]
    rest = jnp.repeat(rest, 2, axis=1)
    return jnp.concatenate([first, rest], axis=1)


class VAE3DDecoder(nn.Module):
    cfg: VAE3DConfig

    @nn.compact
    def __call__(self, z, *, streaming: bool = False, first_chunk: bool = True):
        """z [B, C_lat, F, h, w] (model-space; divide by scaling_factor
        first) → video [B, 3, F_out, H, W] in [-1, 1].

        With `streaming=True` the call processes one temporal chunk and
        carries every causal conv's context in the 'cache' collection
        (apply with mutable=['cache']); see decode_streaming()."""
        c = self.cfg
        widths = list(c.block_widths)
        n_spatial = {2: 1, 4: 2, 8: 3}[c.spatial_factor]
        n_temporal = {1: 0, 2: 1, 4: 2}[c.temporal_factor]
        kw = dict(streaming=streaming, first_chunk=first_chunk)

        x = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(c.dtype)  # B,F,H,W,C
        x = CausalConv3d(widths[-1], dtype=c.dtype, name="conv_in")(x, **kw)
        x = ResBlock3D(widths[-1], c.norm_groups, c.dtype, name="mid_block_1")(x, **kw)
        x = ResBlock3D(widths[-1], c.norm_groups, c.dtype, name="mid_block_2")(x, **kw)

        # decoder stages carry layers_per_block+1 resnets (diffusers
        # CogVideoX decoder layout); upsampler convs are per-frame 2D
        # (kernel (1,3,3)) matching CogVideoXUpsample3D's Conv2d
        n_stages = len(widths)
        for i, w in enumerate(reversed(widths)):
            for j in range(c.layers_per_block + 1):
                x = ResBlock3D(
                    w, c.norm_groups, c.dtype, name=f"up_{i}_res_{j}"
                )(x, **kw)
            if i < n_spatial:
                x = _upsample_spatial(x)
            # temporal upsamples sit in the middle stages (CogVideoX places
            # them with the spatial ones on stages 1..n_temporal)
            if 0 < i <= n_temporal:
                x = _upsample_temporal(x, first_chunk=first_chunk)
            if i < n_stages - 1:
                x = CausalConv3d(
                    w, kernel=(1, 3, 3), dtype=c.dtype, name=f"up_{i}_upsampler"
                )(x, **kw)

        x = SpatialGroupNorm(c.norm_groups, name="norm_out")(x)
        x = CausalConv3d(
            c.image_channels, dtype=c.dtype, name="conv_out"
        )(nn.silu(x), **kw)
        return jnp.transpose(x, (0, 4, 1, 2, 3))  # B,3,F,H,W


class VAE3DEncoder(nn.Module):
    cfg: VAE3DConfig

    @nn.compact
    def __call__(self, video):
        """video [B, 3, F, H, W] in [-1,1] → (mean, logvar) latents
        [B, C_lat, 1+(F-1)/tf, H/sf, W/sf]."""
        c = self.cfg
        widths = list(c.block_widths)
        n_spatial = {2: 1, 4: 2, 8: 3}[c.spatial_factor]
        n_temporal = {1: 0, 2: 1, 4: 2}[c.temporal_factor]

        x = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(c.dtype)
        x = CausalConv3d(widths[0], dtype=c.dtype, name="conv_in")(x)
        for i, w in enumerate(widths):
            for j in range(c.layers_per_block):
                x = ResBlock3D(w, c.norm_groups, c.dtype, name=f"down_{i}_res_{j}")(x)
            t_stride = 2 if i < n_temporal else 1
            s_stride = 2 if i < n_spatial else 1
            if t_stride > 1 or s_stride > 1:
                # strided causal conv: front-replication padding keeps frame
                # 0 in-place, so 1+2k frames stride down to 1+k
                x = CausalConv3d(
                    w, strides=(t_stride, s_stride, s_stride),
                    dtype=c.dtype, name=f"down_{i}_conv",
                )(x)
        x = ResBlock3D(widths[-1], c.norm_groups, c.dtype, name="mid_block_1")(x)
        x = ResBlock3D(widths[-1], c.norm_groups, c.dtype, name="mid_block_2")(x)
        x = SpatialGroupNorm(c.norm_groups, name="norm_out")(x)
        x = CausalConv3d(2 * c.latent_channels, dtype=c.dtype, name="conv_out")(nn.silu(x))
        x = jnp.transpose(x, (0, 4, 1, 2, 3))
        mean, logvar = jnp.split(x, 2, axis=1)
        return mean, logvar


@partial(jax.jit, static_argnames=("model", "first_chunk"))
def _stream_chunk(params, cache, z, *, model, first_chunk):
    """One temporal chunk through the decoder with carried conv caches.
    Returns (video_chunk, {'cache': new_cache}). Jitted once per (model,
    chunk shape, first_chunk) — model/flag are static (frozen dataclass
    config hashes)."""
    variables = {"params": params}
    if not first_chunk:
        variables["cache"] = cache
    return model.apply(
        variables, z, streaming=True, first_chunk=first_chunk,
        mutable=["cache"],
    )


def decode_streaming(
    model: VAE3DDecoder, params, z: jnp.ndarray, *, chunk: int = 2
) -> jnp.ndarray:
    """Temporally chunked decode with carried conv caches — EXACTLY the
    monolithic decode (test_vae3d.py::test_streaming_decode_exact), with
    peak activation memory bounded by the chunk size instead of the full
    49-frame sequence and no per-chunk recompute of earlier frames.

    The reference's `vae.enable_slicing()` analog
    (/root/reference/README.md:117-118): diffusers' AutoencoderKLCogVideoX
    achieves the same with a conv_cache dict threaded through
    CogVideoXCausalConv3d; here the cache is a flax variable collection
    returned functionally from each jitted chunk call.

    z [B, C_lat, F, h, w]; `chunk` = latent frames per call (the first
    chunk carries the global frame 0, so its output is (chunk−1)·tf+1
    frames; later chunks give chunk·tf each)."""
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    f = z.shape[2]
    if f <= chunk:
        return model.apply({"params": params}, z)
    outs = []
    out, vars_ = _stream_chunk(
        params, None, z[:, :, :chunk], model=model, first_chunk=True
    )
    outs.append(out)
    pos = chunk
    while pos < f:
        end = min(pos + chunk, f)
        out, vars_ = _stream_chunk(
            params, vars_["cache"], z[:, :, pos:end],
            model=model, first_chunk=False,
        )
        outs.append(out)
        pos = end
    return jnp.concatenate(outs, axis=2)


def decode_tiled(
    decode_fn,
    z: jnp.ndarray,
    *,
    tile: int = 32,
    overlap: int = 4,
    spatial_factor: int = 8,
) -> jnp.ndarray:
    """Spatially-tiled video decode with linear cross-fade — the
    `enable_tiling()` replacement for 480×720×49 decode within HBM.
    z [B, C, F, h, w]; tiles span full time (temporal causality is exact)."""
    b, c, f, h, w = z.shape
    if h <= tile and w <= tile:
        return decode_fn(z)
    stride = tile - overlap
    fac = spatial_factor
    out = None
    weight = None
    for yi in range(0, max(h - overlap, 1), stride):
        y0 = min(yi, max(h - tile, 0))
        for xi in range(0, max(w - overlap, 1), stride):
            x0 = min(xi, max(w - tile, 0))
            zt = z[:, :, :, y0 : y0 + tile, x0 : x0 + tile]
            img = decode_fn(zt)  # [B,3,F_out,th,tw]
            if out is None:
                f_out = img.shape[2]
                out = jnp.zeros((b, img.shape[1], f_out, h * fac, w * fac), img.dtype)
                weight = jnp.zeros((1, 1, 1, h * fac, w * fac), img.dtype)
            th, tw = img.shape[3], img.shape[4]
            ry = _ramp(th, overlap * fac, img.dtype)
            rx = _ramp(tw, overlap * fac, img.dtype)
            wm = ry[:, None] * rx[None, :]
            out = out.at[:, :, :, y0 * fac : y0 * fac + th, x0 * fac : x0 * fac + tw].add(
                img * wm
            )
            weight = weight.at[
                :, :, :, y0 * fac : y0 * fac + th, x0 * fac : x0 * fac + tw
            ].add(wm)
    return out / jnp.maximum(weight, 1e-8)


def _ramp(size: int, fade: int, dtype) -> jnp.ndarray:
    idx = jnp.arange(size, dtype=jnp.float32)
    up = jnp.clip((idx + 1) / max(fade, 1), 0, 1)
    down = jnp.clip((size - idx) / max(fade, 1), 0, 1)
    return jnp.minimum(up, down).astype(dtype)
