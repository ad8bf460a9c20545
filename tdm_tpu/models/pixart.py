"""PixArt-α DiT denoiser (Flax) — the training-path flagship model.

TPU-native rebuild of the diffusers `Transformer2DModel` the reference
instantiates three times (student `src/main.py:168-170`, fake-score critic
`174-176`, frozen teacher `367-369`; default checkpoint
`PixArt-alpha/PixArt-XL-2-512x512`, `src/args.py:25`). Architecture (per the
HF checkpoint config):

  * latent 4×64×64, patch 2 → 1024 tokens, hidden 1152, 28 layers,
    16 heads × head_dim 72
  * adaLN-single conditioning: one shared timestep MLP emits 6 modulation
    vectors; each block adds a learned `scale_shift_table`
  * per-block: [modulated LN → self-attn → gate] → [cross-attn to T5 tokens,
    NO pre-norm (PixArt quirk)] → [LN → modulated MLP (gelu-tanh) → gate]
  * caption projection: T5 4096 → 1152 two-layer MLP
  * output: 8 channels = ε plus learned variance; every consumer takes the
    first 4 (`chunk(2, dim=1)[0]`: reference `src/models.py:40`,
    `src/predictor.py:35,40`, `src/main.py:483`) — `__call__` returns the
    full 8, `epsilon()` does the split.

The parameter tree mirrors the HF module names so `io/convert.py` can port
safetensors weights key-by-key.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import jax.numpy as jnp
from flax import linen as nn

from tdm_tpu.models import layers as L


@dataclass(frozen=True)
class PixArtConfig:
    sample_size: int = 64  # latent H=W
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8  # ε + learned variance
    num_layers: int = 28
    num_heads: int = 16
    head_dim: int = 72
    caption_dim: int = 4096  # T5-XXL hidden
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    # scan-over-layers: ONE compiled block body + stacked [L, ...] params
    # instead of 28 unrolled copies — cuts XLA compile time ~L× and is the
    # standard TPU big-model layout; param tree gains a leading layer axis
    # under 'blocks' (converters stack, LoRA handles 3-D kernels).
    scan_layers: bool = True
    # remat each block (the reference's --gradient_checkpointing,
    # src/main.py:191-193): trade recompute for activation HBM.
    remat: bool = False
    # 'full' recomputes everything in the block on the backward pass;
    # 'dots' saves matmul outputs and recomputes only elementwise ops
    # (jax dots_with_no_batch_dims_saveable) — faster when the saved
    # activations still fit HBM
    remat_policy: str = "full"
    # research extension: >0 swaps each block's MLP for a top-k
    # mixture-of-experts (models/moe.py) — expert-parallel over an 'ep'
    # mesh axis via moe.ep_shardings. 0 = dense (reference parity).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim  # 1152

    @staticmethod
    def tiny() -> "PixArtConfig":
        """Small config for tests/dry-runs (keeps the real topology)."""
        return PixArtConfig(
            sample_size=16,
            num_layers=2,
            num_heads=2,
            head_dim=16,
            caption_dim=32,
            dtype=jnp.float32,
            attn_impl="xla",
        )


class PixArtBlock(nn.Module):
    cfg: PixArtConfig
    scan: bool = False  # under nn.scan: return (carry, None)

    @nn.compact
    def __call__(self, x, text, text_mask, t6):
        """x [B,S,D] tokens, text [B,L,D] projected caption tokens,
        t6 [B,6,D] shared adaLN-single modulation from the timestep."""
        c = self.cfg
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(0.02),
            (6, c.hidden),
            jnp.float32,
        )
        # pin the modulation input's batch layout INSIDE the scan body:
        # under an activation_sharding() mesh (no-op otherwise) the
        # transposed constraint pins each layer's t6-cotangent contribution
        # too, keeping the backward free of GSPMD full-remat reshards
        from tdm_tpu.parallel.mesh import BATCH, constrain

        t6 = constrain(t6, BATCH, None, None)
        mod = table[None] + t6.astype(jnp.float32)  # [B,6,D]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(x.dtype) for m in jnp.split(mod, 6, axis=1)
        ]  # each [B,1,D]

        h = L.layer_norm(x) * (1 + scale_msa) + shift_msa
        h = L.Attention(
            heads=c.num_heads,
            head_dim=c.head_dim,
            dtype=c.dtype,
            attn_impl=c.attn_impl,
            name="attn1",
        )(h)
        x = x + gate_msa * h

        # PixArt quirk: cross-attention reads the RAW residual stream
        # (no pre-norm) — matches the original PixArt blocks.
        h = L.Attention(
            heads=c.num_heads,
            head_dim=c.head_dim,
            dtype=c.dtype,
            attn_impl=c.attn_impl,
            name="attn2",
        )(x, context=text, key_mask=text_mask)
        x = x + h

        h = L.layer_norm(x) * (1 + scale_mlp) + shift_mlp
        if c.moe_experts > 0:
            from tdm_tpu.models.moe import MoEFeedForward

            h = MoEFeedForward(
                num_experts=c.moe_experts,
                top_k=c.moe_top_k,
                mult=c.mlp_ratio,
                capacity_factor=c.moe_capacity_factor,
                activation="gelu-approximate",
                dtype=c.dtype,
                name="ff",
            )(h)
        else:
            h = L.FeedForward(
                mult=c.mlp_ratio,
                activation="gelu-approximate",
                dtype=c.dtype,
                name="ff",
            )(h)
        out = x + gate_mlp * h
        return (out, None) if self.scan else out


def _remat_block(c: PixArtConfig):
    """nn.remat with the configured checkpoint policy (see
    PixArtConfig.remat_policy)."""
    if c.remat_policy == "dots":
        import jax

        return nn.remat(
            PixArtBlock,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    if c.remat_policy != "full":
        raise ValueError(f"unknown remat_policy {c.remat_policy!r}")
    return nn.remat(PixArtBlock)


def _prologue(c: PixArtConfig, latent, t, text):
    """Everything before the block stack: patchify + positions, adaLN-single
    timestep path, caption projection. Runs inside a compact module scope
    (the full model's, or PixArtPrologue's for pipeline parallelism) —
    param names are identical either way, so one param tree serves both."""
    b = latent.shape[0]
    x = L.PatchEmbed(
        patch_size=c.patch_size,
        dim=c.hidden,
        pos_embed_base_size=c.sample_size // c.patch_size,
        dtype=c.dtype,
        name="pos_embed",
    )(latent.astype(c.dtype))

    # adaLN-single: sinusoidal t → MLP → base embedding [B,D]; a single
    # linear expands it to the 6 shared modulation vectors.
    t_base = L.sinusoidal_timestep_embedding(t, 256)
    t_emb = L.TimestepEmbedding(c.hidden, dtype=c.dtype, name="t_embedder")(
        t_base.astype(c.dtype)
    )
    # pin the modulation path's batch layout on BOTH sides of the 6-way
    # reshape under an activation_sharding() mesh (no-op otherwise) — the
    # backward cotangents otherwise trigger a GSPMD full-remat reshard on
    # ('data','fsdp','tp') train meshes (parallel/mesh.py constrain)
    from tdm_tpu.parallel.mesh import BATCH, constrain

    t6_flat = nn.Dense(6 * c.hidden, dtype=c.dtype, name="t_block")(
        nn.silu(t_emb)
    )
    t6 = constrain(t6_flat, BATCH, None).reshape(b, 6, c.hidden)
    x = constrain(x, BATCH, None, None)
    t6 = constrain(t6, BATCH, None, None)

    # caption projection (PixArtAlphaTextProjection): 4096 → D MLP
    y = nn.Dense(c.hidden, dtype=c.dtype, name="caption_linear_1")(
        text.astype(c.dtype)
    )
    y = nn.gelu(y, approximate=True)
    y = nn.Dense(c.hidden, dtype=c.dtype, name="caption_linear_2")(y)
    return x, y, t6, t_emb


def _epilogue(mod: nn.Module, c: PixArtConfig, x, t_emb, gh, gw, out_dtype):
    """Final adaLN-modulated norm + projection + unpatchify (the part after
    the block stack); same dual-scope contract as _prologue."""
    final_table = mod.param(
        "final_scale_shift_table",
        nn.initializers.normal(0.02),
        (2, c.hidden),
        jnp.float32,
    )
    mod_ = final_table[None] + t_emb.astype(jnp.float32)[:, None]
    shift, scale = [m.astype(x.dtype) for m in jnp.split(mod_, 2, axis=1)]
    x = L.layer_norm(x) * (1 + scale) + shift
    x = nn.Dense(
        c.patch_size * c.patch_size * c.out_channels,
        dtype=c.dtype,
        name="proj_out",
    )(x)
    out = L.unpatchify(x, gh, gw, c.patch_size, c.out_channels)
    return out.astype(out_dtype)


class PixArtPrologue(nn.Module):
    """The full model's pre-block computation as a standalone module —
    apply it with the FULL PixArtTransformer2D param tree (param names are
    shared; keys it doesn't use are ignored). Exists for parallel/pp.py,
    which runs prologue → pipelined blocks → epilogue explicitly."""

    cfg: PixArtConfig

    @nn.compact
    def __call__(self, latent, t, text):
        return _prologue(self.cfg, latent, t, text)


class PixArtEpilogue(nn.Module):
    """Post-block head as a standalone module (see PixArtPrologue)."""

    cfg: PixArtConfig

    @nn.compact
    def __call__(self, x, t_emb, gh: int, gw: int, out_dtype=None):
        return _epilogue(
            self, self.cfg, x, t_emb, gh, gw, out_dtype or self.cfg.dtype
        )


class PixArtTransformer2D(nn.Module):
    """Full DiT. __call__(latent [B,4,H,W], t [B], text [B,L,4096],
    text_mask [B,L]) → [B,8,H,W]."""

    cfg: PixArtConfig = field(default_factory=PixArtConfig)

    @nn.compact
    def __call__(self, latent, t, text, text_mask=None):
        c = self.cfg
        _, _, h, w = latent.shape
        gh, gw = h // c.patch_size, w // c.patch_size

        x, y, t6, t_emb = _prologue(c, latent, t, text)

        if c.scan_layers:
            block_cls = _remat_block(c) if c.remat else PixArtBlock
            stack = nn.scan(
                block_cls,
                # "losses": each layer's sowed MoE aux loss stacks to [L]
                variable_axes={"params": 0, "losses": 0},
                split_rngs={"params": True},
                length=c.num_layers,
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            )
            x, _ = stack(cfg=c, scan=True, name="blocks")(x, y, text_mask, t6)
        else:
            block_cls = _remat_block(c) if c.remat else PixArtBlock
            for i in range(c.num_layers):
                x = block_cls(cfg=c, name=f"blocks_{i}")(x, y, text_mask, t6)

        return _epilogue(self, c, x, t_emb, gh, gw, latent.dtype)


def epsilon(model_out: jnp.ndarray) -> jnp.ndarray:
    """Drop the learned-variance half: `chunk(2, dim=1)[0]` of the reference
    (`src/predictor.py:35,40`)."""
    return jnp.split(model_out, 2, axis=1)[0]


def make_pp_forward(
    model: PixArtTransformer2D,
    mesh,
    *,
    num_microbatches=None,
    pp_axis: str = "pp",
    data_axis=None,
):
    """Pipeline-parallel full forward over `mesh`'s `pp_axis` (see
    parallel/pp.py): fn(params, latent, t, text, text_mask) ≡
    model.apply(...) up to float reassociation, with the stacked `blocks`
    layer axis sharded across stages. Requires scan_layers=True (the
    full-size default). Place params with parallel.pp.pp_param_shardings
    so each stage holds only its own layers."""
    from tdm_tpu.parallel import pp as pp_lib

    c = model.cfg
    if not c.scan_layers:
        raise ValueError("pipeline parallelism needs scan_layers=True")
    pro = PixArtPrologue(cfg=c)
    epi = PixArtEpilogue(cfg=c)
    block_cls = _remat_block(c) if c.remat else PixArtBlock
    blk = block_cls(cfg=c, scan=True)

    def prologue(rest, latent, t, text, text_mask):
        x, y, t6, t_emb = pro.apply({"params": rest}, latent, t, text)
        return x, (y, text_mask, t6), (t_emb, latent)

    def block_apply(layer_params, h, bc):
        y, mask, t6 = bc
        h2, _ = blk.apply({"params": layer_params}, h, y, mask, t6)
        return h2

    def epilogue(rest, x, aux):
        t_emb, latent = aux
        gh = latent.shape[2] // c.patch_size
        gw = latent.shape[3] // c.patch_size
        return epi.apply({"params": rest}, x, t_emb, gh, gw, latent.dtype)

    inner = pp_lib.make_pp_forward(
        prologue,
        block_apply,
        epilogue,
        mesh,
        pp_axis=pp_axis,
        data_axis=data_axis,
        num_microbatches=num_microbatches,
    )

    def fn(params, latent, t, text, text_mask=None):
        t = jnp.asarray(t)
        if t.ndim == 0:  # scalar timestep → per-sample (shard_map batch specs)
            t = jnp.broadcast_to(t, latent.shape[:1])
        if text_mask is None:
            text_mask = jnp.ones(text.shape[:2], jnp.int32)
        return inner(params, latent, t, text, text_mask)

    return fn


def make_denoise_fn(model: PixArtTransformer2D, params):
    """Bind params → the `DenoiseFn` contract of core.sampling/solvers:
    (x, t, cond) → ε, where cond = (text_embeds, text_mask)."""

    def fn(x, t, cond):
        text, mask = cond
        return epsilon(model.apply({"params": params}, x, t, text, mask))

    return fn
