"""CogVideoX 3D-DiT denoiser (Flax) — the text-to-video family.

TPU-native rebuild of the `CogVideoXTransformer3DModel` behind
`CogVideoXPipeline` in the reference's video recipe (`README.md:114-138`:
TDM-CogVideoX-2B LoRA, 4 NFE, 49 frames, seed 8888, generator trained on
t = [999, 856, 665, 399]). Architecture per the THUDM/CogVideoX-2b config:

  * VAE latent [B, 16, F, H/8, W/8]; 49 frames → F = 13 (4× temporal
    compression + 1); 480×720 → 60×90 spatial
  * 2×2 spatial patchify (no temporal patching) → F·(H/16)·(W/16) video
    tokens, text tokens (T5, 226 max) PREPENDED to the sequence
  * joint full attention over [text; video] per block — text and video share
    one stream (unlike SD3's dual-stream MMDiT)
  * CogVideoX adaLN ("LayerNormZero"): silu(temb) → 6 vectors = (shift,
    scale, gate) for the video tokens and separately for the text tokens,
    applied around both attention and FF
  * qk LayerNorm per head; 2B uses learned 3D position embeddings
    (`use_rotary=False`); 5B uses 3D RoPE (`use_rotary=True`) — both
    supported
  * v-prediction in the CogVideoX DDIM convention (the 2B checkpoint is
    v_prediction; handled by the schedule's prediction_type)

The 49-frame sequence (13·(30·45) ≈ 17.6k video tokens + 226 text) is the
framework's long-context stress case — attention runs through the Pallas
flash kernel which never materializes the ~18k² score matrix (SURVEY.md §5
"long-context": memory-scaling, not sequence-parallelism, matching the
reference's xformers+tiling approach).
"""

from __future__ import annotations

from dataclasses import dataclass, field
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdm_tpu.models import layers as L
from tdm_tpu.ops.attention import attention as fused_attention


@dataclass(frozen=True)
class CogVideoXConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 30
    num_heads: int = 30
    head_dim: int = 64
    text_dim: int = 4096  # T5-XXL
    time_embed_dim: int = 512
    max_text_len: int = 226
    sample_frames: int = 13  # latent frames for 49 video frames
    sample_h: int = 60
    sample_w: int = 90
    use_rotary: bool = False  # False: 2B (fixed sincos); True: 5B (3D RoPE)
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    scan_layers: bool = True  # see models/pixart.py for rationale
    remat: bool = False
    # sequence parallelism (opt-in): name of a mesh axis the FRAME axis is
    # sharded over. The model must then be applied under shard_map with the
    # latent split on F (frames → contiguous token rows, since tokens are
    # frame-major) — see `sequence_parallel_apply`. Attention becomes ring
    # attention over the video K/V shards with the replicated text block as
    # a once-only prefix; everything else in the block is token-local, so
    # no other communication exists. This is the SURVEY §5 long-context
    # extension past what one chip's HBM holds (49 frames fits one chip;
    # longer/higher-res videos shard).
    sequence_parallel_axis: str | None = None

    @property
    def hidden(self) -> int:
        return self.num_heads * self.head_dim  # 1920 (2B)

    @staticmethod
    def cogvideox_5b() -> "CogVideoXConfig":
        """THUDM/CogVideoX-5b: 42 layers, 48 heads × 64, 3D RoPE."""
        return CogVideoXConfig(
            num_layers=42, num_heads=48, head_dim=64, use_rotary=True
        )

    @staticmethod
    def tiny(use_rotary: bool = False) -> "CogVideoXConfig":
        return CogVideoXConfig(
            num_layers=2, num_heads=2, head_dim=16, text_dim=32,
            time_embed_dim=16, max_text_len=8, sample_frames=3,
            sample_h=8, sample_w=8, use_rotary=use_rotary,
            dtype=jnp.float32, attn_impl="xla",
        )


def sincos_3d(
    dim: int,
    frames: int,
    grid_h: int,
    grid_w: int,
    *,
    spatial_scale: float = 1.875,
    temporal_scale: float = 1.0,
) -> np.ndarray:
    """Fixed 3D sin-cos positional table [F·H·W, dim] — CogVideoX-2B's
    (non-persistent-buffer) position embedding: dim split (¼ temporal 1D,
    ¾ spatial 2D), grids downscaled by the interpolation scales. Host-side
    numpy; bakes into the compiled program."""
    dim_t = dim // 4
    dim_s = dim * 3 // 4

    def embed_1d(pos, d):
        omega = 1.0 / 10000 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    hh = np.arange(grid_h, dtype=np.float64) / spatial_scale
    ww = np.arange(grid_w, dtype=np.float64) / spatial_scale
    gw, gh = np.meshgrid(ww, hh)
    spatial = np.concatenate(
        [embed_1d(gh, dim_s // 2), embed_1d(gw, dim_s // 2)], axis=1
    )  # [H·W, dim_s]
    tt = np.arange(frames, dtype=np.float64) / temporal_scale
    temporal = embed_1d(tt, dim_t)  # [F, dim_t]

    out = np.concatenate(
        [
            np.broadcast_to(
                temporal[:, None, :], (frames, grid_h * grid_w, dim_t)
            ),
            np.broadcast_to(
                spatial[None, :, :], (frames, grid_h * grid_w, dim_s)
            ),
        ],
        axis=-1,
    )
    return out.reshape(frames * grid_h * grid_w, dim).astype(np.float32)


def rope_3d(
    dim: int, frames: int, grid_h: int, grid_w: int
) -> tuple[np.ndarray, np.ndarray]:
    """3D rotary tables (cos, sin) [F·H·W, dim]: dim split ≈ (t, h, w) =
    (dim/4, 3dim/8, 3dim/8) as in CogVideoX-5B; host-side numpy, static."""
    dim_t = dim // 4
    dim_h = dim * 3 // 8
    dim_w = dim - dim_t - dim_h

    def freqs(n, d):
        inv = 1.0 / (10000 ** (np.arange(0, d, 2, dtype=np.float64) / d))
        ang = np.outer(np.arange(n, dtype=np.float64), inv)  # [n, d/2]
        return np.repeat(ang, 2, axis=1)  # interleaved pairs [n, d]

    ft = freqs(frames, dim_t)[:, None, None, :]
    fh = freqs(grid_h, dim_h)[None, :, None, :]
    fw = freqs(grid_w, dim_w)[None, None, :, :]
    full = np.concatenate(
        [
            np.broadcast_to(ft, (frames, grid_h, grid_w, dim_t)),
            np.broadcast_to(fh, (frames, grid_h, grid_w, dim_h)),
            np.broadcast_to(fw, (frames, grid_h, grid_w, dim_w)),
        ],
        axis=-1,
    ).reshape(frames * grid_h * grid_w, dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


class CogLayerNormZero(nn.Module):
    """silu(temb) → 6 vectors: (shift, scale, gate) for video and (shift,
    scale, gate) for text; one shared AFFINE LayerNorm is applied to both
    streams before modulation (diffusers CogVideoXLayerNormZero — the affine
    LN is `norm1.norm.{weight,bias}` in the checkpoint)."""

    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, ctx, temb):
        mod = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(
            nn.silu(temb)
        ).reshape(temb.shape[0], 6, self.dim)
        shift, scale, gate, c_shift, c_scale, c_gate = [
            mod[:, i][:, None] for i in range(6)
        ]
        norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")
        x = norm(x).astype(self.dtype) * (1 + scale) + shift
        ctx = norm(ctx).astype(self.dtype) * (1 + c_scale) + c_shift
        return x, ctx, gate, c_gate


class CogVideoXBlock(nn.Module):
    cfg: CogVideoXConfig
    scan: bool = False  # under nn.scan: carry=(x, ctx)

    @nn.compact
    def __call__(self, x, ctx, temb=None, rotary=None):
        """x [B,S_vid,D] video tokens, ctx [B,S_txt,D] text tokens."""
        if self.scan:
            x, ctx, (temb, rotary) = *x, ctx
        c = self.cfg
        b, s_vid, _ = x.shape
        s_txt = ctx.shape[1]
        inner = c.hidden

        hx, hc, gate, c_gate = CogLayerNormZero(inner, c.dtype, name="norm1")(
            x, ctx, temb
        )
        # joint sequence: TEXT FIRST (CogVideoX convention)
        h = jnp.concatenate([hc, hx], axis=1)
        q = nn.Dense(inner, dtype=c.dtype, name="to_q")(h)
        k = nn.Dense(inner, dtype=c.dtype, name="to_k")(h)
        v = nn.Dense(inner, dtype=c.dtype, name="to_v")(h)

        def split(t):
            return t.reshape(b, -1, c.num_heads, c.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        # per-head qk LayerNorm (CogVideoX uses LN, not RMS)
        q = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_q")(q).astype(c.dtype)
        k = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_k")(k).astype(c.dtype)
        if rotary is not None:
            # RoPE applies to VIDEO tokens only (text tokens keep identity)
            cos, sin = rotary
            pad = jnp.zeros((s_txt, cos.shape[-1]), cos.dtype)
            cos_full = jnp.concatenate([jnp.ones_like(pad), cos], axis=0)
            sin_full = jnp.concatenate([pad, sin], axis=0)
            q = L.apply_rotary(q, (cos_full, sin_full))
            k = L.apply_rotary(k, (cos_full, sin_full))

        if c.sequence_parallel_axis is not None:
            from tdm_tpu.ops.ring_attention import ring_attention

            # joint layout is [text; video]: the video K/V shard rides the
            # ring, the replicated text block is attended exactly once
            out = ring_attention(
                q, k[:, :, s_txt:], v[:, :, s_txt:],
                axis_name=c.sequence_parallel_axis,
                prefix_kv=(k[:, :, :s_txt], v[:, :, :s_txt]),
                # same impl selector as the monolithic path: flash hops on
                # TPU at video sequence lengths, einsum hops on CPU/tiny
                impl=c.attn_impl,
            )
        else:
            out = fused_attention(q, k, v, impl=c.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, s_txt + s_vid, inner)
        out = nn.Dense(inner, dtype=c.dtype, name="to_out")(out)
        ctx = ctx + c_gate * out[:, :s_txt]
        x = x + gate * out[:, s_txt:]

        hx, hc, gate, c_gate = CogLayerNormZero(inner, c.dtype, name="norm2")(
            x, ctx, temb
        )
        h = jnp.concatenate([hc, hx], axis=1)
        h = L.FeedForward(
            mult=4, activation="gelu-approximate", dtype=c.dtype, name="ff"
        )(h)
        ctx = ctx + c_gate * h[:, :s_txt]
        x = x + gate * h[:, s_txt:]
        return ((x, ctx), None) if self.scan else (x, ctx)


def _prologue(c: CogVideoXConfig, latent, t, text):
    """Everything before the block stack: patchify + positions (or RoPE
    tables), text projection, timestep embedding. Runs inside a compact
    module scope (the full model's, or CogVideoXPrologue's for pipeline
    parallelism) — param names are identical either way, so one param tree
    serves both. Returns (x, ctx, temb, rotary-or-None)."""
    b, ch, f, h, w = latent.shape
    p = c.patch_size
    gh, gw = h // p, w // p
    s_vid = f * gh * gw
    inner = c.hidden

    # spatial patchify per frame: [B,16,F,H,W] → [B, F·gh·gw, D]
    x = jnp.transpose(latent, (0, 2, 3, 4, 1)).astype(c.dtype)  # B,F,H,W,C
    x = x.reshape(b * f, h, w, ch)
    x = nn.Conv(inner, (p, p), strides=(p, p), dtype=c.dtype, name="patch_proj")(x)
    x = x.reshape(b, s_vid, inner)

    ctx = nn.Dense(inner, dtype=c.dtype, name="text_proj")(text.astype(c.dtype))

    # under sequence parallelism this trace sees only the LOCAL frame
    # shard; position tables are built for the GLOBAL frame count and
    # sliced at this shard's first token row (tokens are frame-major,
    # so a frame shard is a contiguous row range)
    f_global, row0 = f, None
    if c.sequence_parallel_axis is not None:
        import jax

        ax = c.sequence_parallel_axis
        f_global = f * jax.lax.psum(1, ax)  # axis size is static
        row0 = jax.lax.axis_index(ax) * s_vid

    rotary = None
    if c.use_rotary:
        cos, sin = rope_3d(c.head_dim, f_global, gh, gw)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        if row0 is not None:
            import jax

            cos = jax.lax.dynamic_slice_in_dim(cos, row0, s_vid, 0)
            sin = jax.lax.dynamic_slice_in_dim(sin, row0, s_vid, 0)
        rotary = (cos, sin)
    else:
        # 2B: FIXED 3D sin-cos positions on video tokens only (text
        # token positions are zero — diffusers CogVideoXPatchEmbed
        # builds the joint buffer with a zero text block; the buffer is
        # non-persistent, so checkpoints carry no pos-embed weights)
        pos = jnp.asarray(sincos_3d(inner, f_global, gh, gw), c.dtype)
        if row0 is not None:
            import jax

            pos = jax.lax.dynamic_slice_in_dim(pos, row0, s_vid, 0)
        x = x + pos[None]

    t_base = L.sinusoidal_timestep_embedding(t, inner)
    temb = L.TimestepEmbedding(
        c.time_embed_dim, dtype=c.dtype, name="time_embedding"
    )(t_base.astype(c.dtype))

    if c.sequence_parallel_axis is not None:
        # shard_map varying-axis typing: ctx derives from the REPLICATED
        # text, but every block mixes ring-attended (varying) video info
        # into it — mark it varying up front so the layer-scan carry
        # types match
        import jax

        ctx = jax.lax.pcast(ctx, c.sequence_parallel_axis, to="varying")
    return x, ctx, temb, rotary


def _epilogue(c: CogVideoXConfig, x, ctx, temb, f, gh, gw, out_dtype):
    """Final joint norm + AdaLayerNorm head + unpatchify (the part after
    the block stack); same dual-scope contract as _prologue."""
    b = x.shape[0]
    p = c.patch_size
    inner = c.hidden
    s_txt = ctx.shape[1]
    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_final")(
        jnp.concatenate([ctx, x], axis=1)
    ).astype(c.dtype)[:, s_txt:]

    # final AdaLayerNorm: affine LN + (shift, scale) from temb
    # (diffusers norm_out.{linear,norm})
    mod = nn.Dense(2 * inner, dtype=c.dtype, name="norm_out_linear")(
        nn.silu(temb)
    ).reshape(b, 2, inner)
    shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
    x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_out_norm")(
        x
    ).astype(c.dtype) * (1 + scale) + shift
    x = nn.Dense(p * p * c.out_channels, dtype=c.dtype, name="proj_out")(x)

    # unpatchify back to [B,16,F,H,W]
    x = x.reshape(b, f, gh, gw, p, p, c.out_channels)
    x = jnp.einsum("bfhwpqc->bcfhpwq", x)
    return x.reshape(b, c.out_channels, f, gh * p, gw * p).astype(out_dtype)


class CogVideoXPrologue(nn.Module):
    """Pre-block computation as a standalone module — apply it with the
    FULL CogVideoXTransformer3D param tree (shared param names; unused
    keys are ignored). Exists for parallel/pp.py."""

    cfg: CogVideoXConfig

    @nn.compact
    def __call__(self, latent, t, text):
        return _prologue(self.cfg, latent, t, text)


class CogVideoXEpilogue(nn.Module):
    """Post-block head as a standalone module (see CogVideoXPrologue)."""

    cfg: CogVideoXConfig

    @nn.compact
    def __call__(self, x, ctx, temb, f: int, gh: int, gw: int, out_dtype=None):
        return _epilogue(
            self.cfg, x, ctx, temb, f, gh, gw, out_dtype or self.cfg.dtype
        )


class CogVideoXTransformer3D(nn.Module):
    """__call__(latent [B,16,F,H,W], t [B], text [B,L,4096]) →
    prediction [B,16,F,H,W] (v-prediction for the 2B checkpoint)."""

    cfg: CogVideoXConfig = field(default_factory=CogVideoXConfig)

    @nn.compact
    def __call__(self, latent, t, text):
        c = self.cfg
        _, _, f, h, w = latent.shape
        p = c.patch_size
        gh, gw = h // p, w // p

        x, ctx, temb, rotary = _prologue(c, latent, t, text)

        block_cls = nn.remat(CogVideoXBlock) if c.remat else CogVideoXBlock
        if c.scan_layers:
            stack = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.num_layers,
                in_axes=(nn.broadcast,),
            )
            (x, ctx), _ = stack(cfg=c, scan=True, name="blocks")(
                (x, ctx), (temb, rotary)
            )
        else:
            for i in range(c.num_layers):
                x, ctx = block_cls(cfg=c, name=f"blocks_{i}")(
                    x, ctx, temb, rotary
                )

        return _epilogue(c, x, ctx, temb, f, gh, gw, latent.dtype)


def make_pp_forward(
    model: CogVideoXTransformer3D,
    mesh,
    *,
    num_microbatches=None,
    pp_axis: str = "pp",
    data_axis=None,
):
    """Pipeline-parallel full forward over `mesh`'s `pp_axis` (see
    parallel/pp.py): fn(params, latent, t, text) ≡ model.apply(...) up to
    float reassociation, with the stacked `blocks` layer axis sharded
    across stages — the carry is the (video tokens, text tokens) pair, the
    per-microbatch broadcast is temb, and the RoPE tables ride the
    batch-independent `static` slot. Requires scan_layers=True and no
    sequence_parallel_axis (PP and SP address different limits: PP shards
    WEIGHT depth, SP shards one video's frames). Place params with
    parallel.pp.pp_param_shardings."""
    from tdm_tpu.parallel import pp as pp_lib

    c = model.cfg
    if not c.scan_layers:
        raise ValueError("pipeline parallelism needs scan_layers=True")
    if c.sequence_parallel_axis is not None:
        raise ValueError(
            "pipeline parallelism does not compose with "
            "sequence_parallel_axis — use one or the other"
        )
    pro = CogVideoXPrologue(cfg=c)
    epi = CogVideoXEpilogue(cfg=c)
    block_cls = nn.remat(CogVideoXBlock) if c.remat else CogVideoXBlock
    blk = block_cls(cfg=c)

    def prologue(rest, latent, t, text):
        x, ctx, temb, rotary = pro.apply({"params": rest}, latent, t, text)
        aux = (temb, latent)
        if rotary is None:
            return (x, ctx), temb, aux
        return (x, ctx), temb, rotary, aux

    def block_apply(layer_params, carry, temb_mb, rotary=None):
        x, ctx = carry
        return blk.apply(
            {"params": layer_params}, x, ctx, temb_mb, rotary
        )

    def epilogue(rest, carry, aux):
        x, ctx = carry
        temb, latent = aux
        f = latent.shape[2]
        gh = latent.shape[3] // c.patch_size
        gw = latent.shape[4] // c.patch_size
        return epi.apply(
            {"params": rest}, x, ctx, temb, f, gh, gw, latent.dtype
        )

    inner = pp_lib.make_pp_forward(
        prologue,
        block_apply,
        epilogue,
        mesh,
        pp_axis=pp_axis,
        data_axis=data_axis,
        num_microbatches=num_microbatches,
    )

    def fn(params, latent, t, text):
        t = jnp.asarray(t)
        if t.ndim == 0:  # scalar timestep → per-sample (shard_map batch specs)
            t = jnp.broadcast_to(t, latent.shape[:1])
        return inner(params, latent, t, text)

    return fn


def sequence_parallel_apply(model: CogVideoXTransformer3D, mesh, *, data_axis=None):
    """Wrap `model.apply` in shard_map for sequence-parallel execution:
    latent frames sharded over the cfg's `sequence_parallel_axis` of `mesh`
    (optionally batch over `data_axis`), params/text replicated over 'sp'.
    Returns fn(params, latent [B,C,F,H,W], t [B], text [B,L,Dt]) with the
    full (unsharded-looking) output — jit it with mesh-placed inputs.

    F must divide by the sp axis size. The only cross-shard communication
    is the per-block ring attention (lax.ppermute over ICI); patchify, all
    norms, FF, and unpatchify are token-local.

    COMPOSES with tensor parallelism: any mesh axis beyond (`data_axis`,
    sp) — e.g. a 'tp' axis — is left AUTOMATIC (partial-auto shard_map),
    so params placed with the megatron rule (parallel/tp.py tp_shardings
    over this mesh) get their projections GSPMD-sharded inside each
    sequence shard. Exactness vs monolithic: test_cogvideox_sp.py."""
    import jax
    from jax.sharding import PartitionSpec as P

    ax = model.cfg.sequence_parallel_axis
    if ax is None:
        raise ValueError(
            "model.cfg.sequence_parallel_axis is None — construct the model "
            "with the sp axis name to use sequence_parallel_apply"
        )

    def local(params, latent, t, text):
        return model.apply({"params": params}, latent, t, text)

    manual = {ax} | ({data_axis} if data_axis is not None else set())
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),
            P(data_axis, None, ax, None, None),
            P(data_axis),
            P(data_axis),
        ),
        out_specs=P(data_axis, None, ax, None, None),
        axis_names=manual,
    )


def make_denoise_fn(model: CogVideoXTransformer3D, params):
    """DenoiseFn contract: (x, t, cond) → model output; cond = T5 text
    embeddings [B,L,4096] (CogVideoX passes no mask — fixed 226-token pad)."""

    def fn(x, t, cond):
        return model.apply({"params": params}, x, t, cond)

    return fn
