"""Shared Flax building blocks for the denoiser zoo.

These are the TPU-native equivalents of the diffusers building blocks the
reference's models are assembled from (Transformer2DModel / UNet / MMDiT
internals). Structure and parameter naming deliberately mirror the HF
checkpoints' module tree so `io/convert.py` can port weights 1:1, but the
compute path is jnp/Pallas (no torch semantics).

Conventions:
  * param_dtype fp32 (master weights), compute `dtype` configurable
    (bf16 on TPU — replaces the reference's fp16 AMP, `src/args.py:232-242`).
  * attention runs through `tdm_tpu.ops.attention` (Pallas flash on TPU).
  * token layout [B, S, D]; head split/merge lives here, not in the kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdm_tpu.ops.attention import attention as fused_attention


def sinusoidal_timestep_embedding(
    t: jnp.ndarray,
    dim: int,
    *,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Classic DDPM sinusoidal embedding of (possibly fractional) timesteps.

    Matches diffusers `Timesteps` (flip_sin_to_cos/downscale_freq_shift knobs
    differ per model family). t: [B] float/int → [B, dim] fp32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :] * scale
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer MLP over the sinusoidal embedding (diffusers TimestepEmbedding)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


def get_2d_sincos_pos_embed(
    dim: int, grid_h: int, grid_w: int, *, base_size: Optional[int] = None
) -> np.ndarray:
    """Fixed 2D sin-cos position embedding table [grid_h*grid_w, dim]
    (the PixArt/DiT patch-position embedding; host-side numpy, baked as a
    constant into the jitted program)."""
    h = np.arange(grid_h, dtype=np.float64)
    w = np.arange(grid_w, dtype=np.float64)
    if base_size is not None:
        h = h / (grid_h / base_size)
        w = w / (grid_w / base_size)
    gw, gh = np.meshgrid(w, h)  # gh/gw: [H, W]

    def embed_1d(pos, d):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = embed_1d(gh, dim // 2)
    emb_w = embed_1d(gw, dim // 2)
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class PatchEmbed(nn.Module):
    """Patchify [B, C, H, W] → tokens [B, (H/p)(W/p), dim] via conv, plus a
    fixed sin-cos position embedding (diffusers PatchEmbed as used by
    PixArt)."""

    patch_size: int
    dim: int
    pos_embed_base_size: Optional[int] = None
    add_pos_embed: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        p = self.patch_size
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU conv
        x = nn.Conv(
            self.dim,
            kernel_size=(p, p),
            strides=(p, p),
            dtype=self.dtype,
            name="proj",
        )(x)
        gh, gw = h // p, w // p
        x = x.reshape(b, gh * gw, self.dim)
        if self.add_pos_embed:
            pos = get_2d_sincos_pos_embed(
                self.dim, gh, gw, base_size=self.pos_embed_base_size
            )
            x = x + jnp.asarray(pos, self.dtype)[None]
        return x


class Attention(nn.Module):
    """Multi-head (self or cross) attention over [B, S, D] tokens.

    Mirrors diffusers `Attention` parameter layout (to_q/to_k/to_v/to_out);
    the inner product runs through the fused Pallas/XLA kernel.
    """

    heads: int
    head_dim: int
    out_dim: Optional[int] = None
    qkv_bias: bool = True
    qk_norm: Optional[str] = None  # None | 'rms' (SD3/CogVideoX variants)
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        rotary: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        b, s, _ = x.shape
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(ctx)

        def split(t):
            return t.reshape(b, -1, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # pin the head-parallel layout under an activation_sharding() mesh
        # (megatron tp: heads over 'tp'); no-op single-device. Keeps GSPMD
        # from inventing inconsistent cotangent layouts across the split/
        # merge reshapes (parallel/mesh.py constrain docstring).
        from tdm_tpu.parallel.mesh import BATCH, FEATURES, HEADS, constrain

        q, k, v = (constrain(t, BATCH, HEADS, None, None) for t in (q, k, v))
        if self.qk_norm == "rms":
            q = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_k")(k)
        if rotary is not None:
            q = apply_rotary(q, rotary)
            k = apply_rotary(k, rotary)
        out = fused_attention(q, k, v, key_mask, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        out = constrain(out, BATCH, None, FEATURES)
        return nn.Dense(
            self.out_dim or x.shape[-1], dtype=self.dtype, name="to_out"
        )(out)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32**2, axis=-1, keepdims=True)
        out = x32 * jax.lax.rsqrt(var + self.eps)
        return (out * scale).astype(self.dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm in fp32 (the `elementwise_affine=False` norms
    that adaLN modulation replaces)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class FeedForward(nn.Module):
    """Transformer MLP: gelu-tanh ('gelu-approximate', PixArt) or GEGLU
    (SD-family) inner activation, mult× expansion."""

    mult: int = 4
    activation: str = "gelu-approximate"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.activation == "geglu":
            # diffusers GEGLU: h · gelu(gate) with EXACT (erf) gelu —
            # F.gelu's default; only 'gelu-approximate' is the tanh variant
            h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        elif self.activation == "gelu-approximate":
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = nn.gelu(h, approximate=True)
        elif self.activation == "gelu":
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = nn.gelu(h, approximate=False)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation x·(1+scale)+shift; shift/scale [B, D] or [B, 1, D]."""
    if shift.ndim == 2:
        shift, scale = shift[:, None], scale[:, None]
    return x * (1 + scale) + shift


def apply_rotary(
    x: jnp.ndarray, rotary: tuple[jnp.ndarray, jnp.ndarray]
) -> jnp.ndarray:
    """Rotate pairs (x0,x1) by the (cos, sin) tables; x [B, H, S, D],
    cos/sin [S, D] (interleaved-pair convention, used by CogVideoX-5B/SD3.5
    style models)."""
    cos, sin = rotary
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c, s = cos[..., 0::2], sin[..., 0::2]
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def unpatchify(
    tokens: jnp.ndarray, grid_h: int, grid_w: int, patch: int, channels: int
) -> jnp.ndarray:
    """[B, gh*gw, p·p·C] → [B, C, gh·p, gw·p] (inverse of PatchEmbed)."""
    b = tokens.shape[0]
    x = tokens.reshape(b, grid_h, grid_w, patch, patch, channels)
    x = jnp.einsum("bhwpqc->bchpwq", x)
    return x.reshape(b, channels, grid_h * patch, grid_w * patch)
