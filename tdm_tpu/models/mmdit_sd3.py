"""SD3 MMDiT denoiser (Flax) — the headline 4-NFE inference model.

TPU-native rebuild of the `SD3Transformer2DModel` behind
`StableDiffusion3Pipeline` in the reference's flagship recipe
(`README.md:44-85`: TDM-SD3-LoRA, 4 steps, 1024², guidance 1.0, LoRA scale
0.125, DPM-Solver with flow_shift). Architecture per the
stabilityai/stable-diffusion-3-medium-diffusers checkpoint config:

  * latent 16×128×128 (1024px), patch 2 → 4096 image tokens
  * 24 dual-stream joint blocks, 24 heads × 64 = 1536 hidden
  * conditioning: sinusoidal timestep MLP + pooled CLIP(L+G) 2048→1536 MLP,
    summed → adaLN-Zero modulation (6 vectors per stream per block)
  * context: concat[CLIP seq (padded to 4096), T5-XXL seq] → linear 4096→1536
  * joint attention: image and text tokens project separately, attend as one
    concatenated sequence (S ≈ 4096+333), split back; last block drops the
    text stream (context_pre_only)
  * fixed sin-cos pos embed computed at pos_embed_max_size=192 and
    center-cropped to the actual grid
  * rectified-flow ε-parameterization: model output is the velocity
    v = ε - x₀ (prediction type FLOW in core.schedules)

Parameter tree mirrors HF module names for safetensors porting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tdm_tpu.models import layers as L


@dataclass(frozen=True)
class MMDiTConfig:
    sample_size: int = 128  # latent H=W at 1024px
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    num_heads: int = 24
    head_dim: int = 64
    context_dim: int = 4096  # joint_attention_dim (T5 / padded CLIP)
    pooled_dim: int = 2048  # pooled CLIP-L+G
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # 'rms' for SD3.5-family
    # SD3.5-Medium: these block indices carry an EXTRA image-stream
    # self-attention (HF use_dual_attention: norm1 emits 9 modulation
    # vectors, attn2 output gated by the extra gate). Must be a contiguous
    # prefix 0..d-1 when scan_layers (two homogeneous stacks: 'blocks_dual'
    # then 'blocks'); arbitrary sets work unrolled.
    dual_attention_layers: tuple = ()
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    # scan the homogeneous dual-stream blocks (stacked params under
    # 'blocks_dual'/'blocks'); the final context_pre_only block stays
    # unrolled as 'blocks_{N-1}'. See models/pixart.py for the rationale.
    scan_layers: bool = True
    remat: bool = False

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim  # 1536

    @staticmethod
    def sd35_medium() -> "MMDiTConfig":
        """SD3.5-Medium: 23 layers, RMS qk-norm, dual attention on blocks
        0-12, pos_embed_max_size 384 (HF stable-diffusion-3.5-medium
        config). The TDM recipes target SD3-Medium (README.md:44); this
        preset exists for checkpoint parity beyond them."""
        return MMDiTConfig(
            num_layers=23,
            qk_norm="rms",
            dual_attention_layers=tuple(range(13)),
            pos_embed_max_size=384,
        )

    @staticmethod
    def sd35_large() -> "MMDiTConfig":
        """SD3.5-Large: 38 layers, 38 heads × 64 (hidden 2432), RMS qk-norm."""
        return MMDiTConfig(
            num_layers=38, num_heads=38, head_dim=64, qk_norm="rms"
        )

    @staticmethod
    def tiny() -> "MMDiTConfig":
        return MMDiTConfig(
            sample_size=8,
            num_layers=2,
            num_heads=2,
            head_dim=16,
            context_dim=48,
            pooled_dim=24,
            pos_embed_max_size=16,
            dtype=jnp.float32,
            attn_impl="xla",
        )


class AdaLNZero(nn.Module):
    """silu(temb) → linear → n modulation vectors [B, n, D] (diffusers
    AdaLayerNormZero emits 6; AdaLayerNormContinuous emits 2)."""

    n: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb: jnp.ndarray) -> jnp.ndarray:
        out = nn.Dense(self.n * self.dim, dtype=self.dtype, name="linear")(
            nn.silu(temb)
        )
        return out.reshape(temb.shape[0], self.n, self.dim)


class JointBlock(nn.Module):
    cfg: MMDiTConfig
    context_pre_only: bool = False
    # SD3.5 dual attention: extra image-stream self-attention alongside the
    # joint attention (HF JointTransformerBlock use_dual_attention)
    dual_attention: bool = False
    scan: bool = False  # under nn.scan: carry=(x, ctx), returns (carry, None)

    @nn.compact
    def __call__(self, x, ctx, temb=None):
        """x [B,S,D] image tokens, ctx [B,L,D] text tokens, temb [B,D]."""
        if self.scan:
            x, ctx, temb = *x, ctx  # carry unpack: ((x, ctx), temb)
        c = self.cfg
        b, s, _ = x.shape
        lctx = ctx.shape[1]
        inner = c.hidden

        # AdaLayerNormZero (6) or AdaLayerNormZeroX (9: + shift/scale/gate
        # for the dual attention branch — HF chunk order)
        mod_x = AdaLNZero(
            9 if self.dual_attention else 6, inner, dtype=c.dtype, name="norm1"
        )(temb)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mod_x[:, i][:, None] for i in range(6)
        ]
        if self.dual_attention:
            sh_msa2, sc_msa2, g_msa2 = [
                mod_x[:, i][:, None] for i in range(6, 9)
            ]
        if self.context_pre_only:
            # final block: context gets plain (scale, shift) and no output
            mod_c = AdaLNZero(2, inner, dtype=c.dtype, name="norm1_context")(temb)
            # AdaLayerNormContinuous chunk order is (scale, shift)
            csc, csh = mod_c[:, 0][:, None], mod_c[:, 1][:, None]
            c_g_msa = c_sh_mlp = c_sc_mlp = c_g_mlp = None
        else:
            mod_c = AdaLNZero(6, inner, dtype=c.dtype, name="norm1_context")(temb)
            csh, csc, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = [
                mod_c[:, i][:, None] for i in range(6)
            ]

        hx = L.layer_norm(x) * (1 + sc_msa) + sh_msa
        hc = L.layer_norm(ctx) * (1 + csc) + csh

        # joint attention: separate projections, one fused attention over
        # the concatenated sequence
        def proj(name, t, d_in):
            return nn.Dense(inner, dtype=c.dtype, name=name)(t)

        q_x = proj("to_q", hx, inner)
        k_x = proj("to_k", hx, inner)
        v_x = proj("to_v", hx, inner)
        q_c = proj("add_q_proj", hc, inner)
        k_c = proj("add_k_proj", hc, inner)
        v_c = proj("add_v_proj", hc, inner)

        def split(t):
            return t.reshape(b, -1, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        q = split(jnp.concatenate([q_x, q_c], axis=1))
        k = split(jnp.concatenate([k_x, k_c], axis=1))
        v = split(jnp.concatenate([v_x, v_c], axis=1))
        if c.qk_norm == "rms":
            q = L.RMSNorm(dtype=c.dtype, name="norm_q")(q)
            k = L.RMSNorm(dtype=c.dtype, name="norm_k")(k)

        from tdm_tpu.ops.attention import attention as fused_attention

        out = fused_attention(q, k, v, impl=c.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, s + lctx, inner)
        out_x, out_c = out[:, :s], out[:, s:]

        x_in = x
        x = x_in + g_msa * nn.Dense(inner, dtype=c.dtype, name="to_out")(out_x)
        if self.dual_attention:
            # parallel branch from the BLOCK INPUT (both attention inputs
            # derive from x_in in the HF block), added after the joint out
            hx2 = L.layer_norm(x_in) * (1 + sc_msa2) + sh_msa2
            a2 = L.Attention(
                heads=c.num_heads,
                head_dim=c.head_dim,
                qk_norm=c.qk_norm,
                dtype=c.dtype,
                attn_impl=c.attn_impl,
                name="attn2",
            )(hx2)
            x = x + g_msa2 * a2
        hx = L.layer_norm(x) * (1 + sc_mlp) + sh_mlp
        x = x + g_mlp * L.FeedForward(
            mult=4, activation="gelu-approximate", dtype=c.dtype, name="ff"
        )(hx)

        if self.context_pre_only:
            return x, None
        ctx = ctx + c_g_msa * nn.Dense(
            inner, dtype=c.dtype, name="to_add_out"
        )(out_c)
        hc = L.layer_norm(ctx) * (1 + c_sc_mlp) + c_sh_mlp
        ctx = ctx + c_g_mlp * L.FeedForward(
            mult=4, activation="gelu-approximate", dtype=c.dtype, name="ff_context"
        )(hc)
        return ((x, ctx), None) if self.scan else (x, ctx)


class SD3Transformer2D(nn.Module):
    """__call__(latent [B,16,H,W], t [B] (∈[0,1000], flow σ·1000),
    context [B,L,4096], pooled [B,2048]) → velocity [B,16,H,W]."""

    cfg: MMDiTConfig = field(default_factory=MMDiTConfig)

    @nn.compact
    def __call__(self, latent, t, context, pooled):
        c = self.cfg
        b, _, h, w = latent.shape
        p = c.patch_size
        gh, gw = h // p, w // p

        x = L.PatchEmbed(
            patch_size=p,
            dim=c.hidden,
            add_pos_embed=False,
            dtype=c.dtype,
            name="pos_embed",
        )(latent.astype(c.dtype))
        # fixed sincos at max grid, center-cropped (SD3 PatchEmbed behavior)
        base = c.sample_size // p
        full = L.get_2d_sincos_pos_embed(
            c.hidden, c.pos_embed_max_size, c.pos_embed_max_size, base_size=base
        ).reshape(c.pos_embed_max_size, c.pos_embed_max_size, c.hidden)
        top = (c.pos_embed_max_size - gh) // 2
        left = (c.pos_embed_max_size - gw) // 2
        pos = full[top : top + gh, left : left + gw].reshape(1, gh * gw, c.hidden)
        x = x + jnp.asarray(pos, c.dtype)

        t_base = L.sinusoidal_timestep_embedding(t, 256)
        temb = L.TimestepEmbedding(c.hidden, dtype=c.dtype, name="timestep_embedder")(
            t_base.astype(c.dtype)
        )
        pooled_emb = L.TimestepEmbedding(
            c.hidden, dtype=c.dtype, name="text_embedder"
        )(pooled.astype(c.dtype))
        temb = temb + pooled_emb

        ctx = nn.Dense(c.hidden, dtype=c.dtype, name="context_embedder")(
            context.astype(c.dtype)
        )

        block_cls = nn.remat(JointBlock) if c.remat else JointBlock
        dual_set = set(c.dual_attention_layers)
        if c.scan_layers and c.num_layers > 1:
            n_dual = len(dual_set)
            if dual_set and dual_set != set(range(n_dual)):
                raise ValueError(
                    "scan_layers requires dual_attention_layers to be a "
                    f"contiguous prefix 0..{n_dual - 1}, got "
                    f"{sorted(dual_set)} (use scan_layers=False otherwise)"
                )

            def scan_stack(length, name, dual):
                stack = nn.scan(
                    block_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=length,
                    in_axes=(nn.broadcast,),
                )
                return stack(cfg=c, scan=True, dual_attention=dual, name=name)

            if n_dual:
                # SD3.5: dual-attention prefix under 'blocks_dual'
                (x, ctx), _ = scan_stack(min(n_dual, c.num_layers - 1),
                                         "blocks_dual", True)((x, ctx), temb)
            n_plain = c.num_layers - 1 - min(n_dual, c.num_layers - 1)
            if n_plain > 0:
                (x, ctx), _ = scan_stack(n_plain, "blocks", False)(
                    (x, ctx), temb
                )
            x, ctx = block_cls(
                cfg=c, context_pre_only=True, name=f"blocks_{c.num_layers - 1}"
            )(x, ctx, temb)
        else:
            for i in range(c.num_layers):
                x, ctx = block_cls(
                    cfg=c,
                    context_pre_only=(i == c.num_layers - 1),
                    dual_attention=(i in dual_set),
                    name=f"blocks_{i}",
                )(x, ctx, temb)

        # AdaLayerNormContinuous final norm: chunk order (scale, shift)
        mod = AdaLNZero(2, c.hidden, dtype=c.dtype, name="norm_out")(temb)
        scale, shift = mod[:, 0][:, None], mod[:, 1][:, None]
        x = L.layer_norm(x) * (1 + scale) + shift
        x = nn.Dense(p * p * c.out_channels, dtype=c.dtype, name="proj_out")(x)
        out = L.unpatchify(x, gh, gw, p, c.out_channels)
        return out.astype(latent.dtype)


def make_denoise_fn(model: SD3Transformer2D, params):
    """DenoiseFn contract: (x, t, cond) → flow velocity, cond = (context
    tokens, pooled embedding). t is the solver's continuous model_t."""

    def fn(x, t, cond):
        context, pooled = cond
        return model.apply({"params": params}, x, t, context, pooled)

    return fn
