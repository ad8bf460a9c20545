"""Block-level torch replicas of the riskiest denoiser semantics.

Round-3 VERDICT: converter tests were structural-only — synthetic state
dicts built from the same assumptions as the converters can share a
misconception. These tests pin the semantics a wrong reading of the HF code
would get wrong, by rebuilding each block in TORCH from torch primitives
(the ops proven against the real frameworks in test_torch_parity.py /
test_text_encoders.py) and asserting numerical agreement with the Flax
block under IDENTICAL weights:

  1. PixArt adaLN-single modulation order + the no-prenorm cross-attention
     (diffusers BasicTransformerBlock, norm_type='ada_norm_single' —
     reference denoiser, /root/reference/src/main.py:168-170)
  2. SD3 MMDiT joint-attention concat/split + AdaLayerNormZero chunk order
     + AdaLayerNormContinuous (scale, shift) order on the final block
     (diffusers JointTransformerBlock — reference recipe README.md:44-85)
  3. CogVideoX shared-affine LayerNormZero, text-first joint sequence,
     per-head qk LayerNorm, and 3D RoPE on video tokens only in the
     interleaved-pair convention (diffusers CogVideoXBlock +
     apply_rotary_emb — reference recipe README.md:114-138)
  4. SD1.5 UNet, the FULL tiny forward (diffusers UNet2DConditionModel —
     reference import src/main.py:46, Dreamshaper recipe README.md:90-107):
     ResnetBlock2D temb injection point, Downsample2D symmetric padding,
     nearest-upsample + conv, skip-stack pop order, GEGLU with EXACT gelu,
     Timesteps flip_sin_to_cos ordering

The torch side is written from diffusers' documented block semantics using
only torch primitives — an independent reimplementation in a different
framework, so transpose conventions, norm eps/casting, chunk orders, and
RoPE pairing must all agree for these to pass. Full-checkpoint activation
parity (real HF weights) is covered by tests/test_parity_fixtures.py +
scripts/record_parity_fixtures.py on a diffusers-equipped machine.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tdm_tpu.models import cogvideox as cog  # noqa: E402
from tdm_tpu.models import mmdit_sd3 as mmdit  # noqa: E402
from tdm_tpu.models import pixart  # noqa: E402
from tdm_tpu.models import unet_sd15  # noqa: E402


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, np.float32))


def _lin(params: dict) -> torch.nn.Linear:
    """Flax Dense params {kernel [in,out], bias} → torch Linear."""
    k = np.asarray(params["kernel"], np.float32)
    m = torch.nn.Linear(k.shape[0], k.shape[1], bias="bias" in params)
    with torch.no_grad():
        m.weight.copy_(_t(k.T))
        if "bias" in params:
            m.bias.copy_(_t(params["bias"]))
    return m


def _ln_noaffine(x: torch.Tensor, eps: float = 1e-6) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), eps=eps)


def _gelu_tanh_mlp(ff: dict, x: torch.Tensor) -> torch.Tensor:
    """diffusers FeedForward(activation_fn='gelu-approximate')."""
    h = _lin(ff["proj_in"])(x)
    h = F.gelu(h, approximate="tanh")
    return _lin(ff["proj_out"])(h)


def _mha(q, k, v, heads):
    """torch SDPA over [B,S,H·Dh] projections (diffusers AttnProcessor2_0)."""
    b, s, inner = q.shape
    dh = inner // heads

    def split(t):
        return t.view(b, -1, heads, dh).transpose(1, 2)

    out = F.scaled_dot_product_attention(split(q), split(k), split(v))
    return out.transpose(1, 2).reshape(b, -1, inner)


# ---------------------------------------------------------------------------
# 1. PixArt adaLN-single block
# ---------------------------------------------------------------------------


def _torch_pixart_block(p: dict, x, text, t6, heads):
    """diffusers BasicTransformerBlock with norm_type='ada_norm_single':
    modulation = scale_shift_table[None] + t6, chunked into (shift_msa,
    scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp); self-attn on the
    modulated LN; cross-attn on the RAW residual stream (ada_norm_single
    skips norm2 before attn2); gelu-tanh MLP on the second modulated LN."""
    table = _t(p["scale_shift_table"])  # [6, D]
    mod = table.unsqueeze(0) + t6  # [B, 6, D]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        mod.chunk(6, dim=1)
    )

    h = _ln_noaffine(x) * (1 + scale_msa) + shift_msa
    a1 = p["attn1"]
    h = _mha(_lin(a1["to_q"])(h), _lin(a1["to_k"])(h), _lin(a1["to_v"])(h), heads)
    x = x + gate_msa * _lin(a1["to_out"])(h)

    a2 = p["attn2"]
    h = _mha(
        _lin(a2["to_q"])(x), _lin(a2["to_k"])(text), _lin(a2["to_v"])(text), heads
    )
    x = x + _lin(a2["to_out"])(h)

    h = _ln_noaffine(x) * (1 + scale_mlp) + shift_mlp
    return x + gate_mlp * _gelu_tanh_mlp(p["ff"], h)


def test_pixart_block_matches_torch_replica():
    cfg = pixart.PixArtConfig.tiny()
    block = pixart.PixArtBlock(cfg=cfg)
    rng = np.random.default_rng(0)
    b, s, l, d = 2, 24, 7, cfg.hidden
    x = rng.standard_normal((b, s, d), np.float32)
    text = rng.standard_normal((b, l, d), np.float32)
    t6 = rng.standard_normal((b, 6, d), np.float32)
    params = block.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(text), None,
        jnp.asarray(t6),
    )["params"]
    flax_out = np.asarray(
        block.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(text), None,
            jnp.asarray(t6),
        )
    )
    with torch.no_grad():
        torch_out = _torch_pixart_block(
            jax.tree.map(np.asarray, params), _t(x), _t(text), _t(t6),
            cfg.num_heads,
        ).numpy()
    np.testing.assert_allclose(flax_out, torch_out, atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# 2. SD3 MMDiT joint block
# ---------------------------------------------------------------------------


def _ada_ln_zero(p: dict, temb: torch.Tensor, n: int):
    """diffusers AdaLayerNormZero family: linear(silu(temb)) → n chunks."""
    out = _lin(p["linear"])(F.silu(temb))
    return out.chunk(n, dim=-1)


def _torch_joint_block(p, x, ctx, temb, heads, context_pre_only):
    """diffusers JointTransformerBlock: AdaLayerNormZero chunk order
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) on the
    image stream; context stream likewise, except the final block uses
    AdaLayerNormContinuous whose chunk order is (SCALE, shift). Joint
    attention concatenates image tokens FIRST, text second."""
    sh, sc, g, sh_mlp, sc_mlp, g_mlp = [
        m.unsqueeze(1) for m in _ada_ln_zero(p["norm1"], temb, 6)
    ]
    if context_pre_only:
        c_sc, c_sh = [
            m.unsqueeze(1) for m in _ada_ln_zero(p["norm1_context"], temb, 2)
        ]
    else:
        c_sh, c_sc, c_g, c_sh_mlp, c_sc_mlp, c_g_mlp = [
            m.unsqueeze(1) for m in _ada_ln_zero(p["norm1_context"], temb, 6)
        ]

    hx = _ln_noaffine(x) * (1 + sc) + sh
    hc = _ln_noaffine(ctx) * (1 + c_sc) + c_sh

    s = x.shape[1]
    q = torch.cat([_lin(p["to_q"])(hx), _lin(p["add_q_proj"])(hc)], dim=1)
    k = torch.cat([_lin(p["to_k"])(hx), _lin(p["add_k_proj"])(hc)], dim=1)
    v = torch.cat([_lin(p["to_v"])(hx), _lin(p["add_v_proj"])(hc)], dim=1)
    out = _mha(q, k, v, heads)
    out_x, out_c = out[:, :s], out[:, s:]

    x = x + g * _lin(p["to_out"])(out_x)
    hx = _ln_noaffine(x) * (1 + sc_mlp) + sh_mlp
    x = x + g_mlp * _gelu_tanh_mlp(p["ff"], hx)
    if context_pre_only:
        return x, None
    ctx = ctx + c_g * _lin(p["to_add_out"])(out_c)
    hc = _ln_noaffine(ctx) * (1 + c_sc_mlp) + c_sh_mlp
    ctx = ctx + c_g_mlp * _gelu_tanh_mlp(p["ff_context"], hc)
    return x, ctx


def test_sd3_joint_block_matches_torch_replica():
    cfg = mmdit.MMDiTConfig.tiny()
    rng = np.random.default_rng(1)
    b, s, l, d = 2, 16, 6, cfg.hidden
    x = rng.standard_normal((b, s, d), np.float32)
    ctx = rng.standard_normal((b, l, d), np.float32)
    temb = rng.standard_normal((b, d), np.float32)

    for pre_only in (False, True):
        block = mmdit.JointBlock(cfg=cfg, context_pre_only=pre_only)
        params = block.init(
            jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(ctx),
            jnp.asarray(temb),
        )["params"]
        fx, fctx = block.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(ctx),
            jnp.asarray(temb),
        )
        with torch.no_grad():
            tx, tctx = _torch_joint_block(
                jax.tree.map(np.asarray, params), _t(x), _t(ctx), _t(temb),
                cfg.num_heads, pre_only,
            )
        np.testing.assert_allclose(
            np.asarray(fx), tx.numpy(), atol=3e-5, rtol=3e-5,
            err_msg=f"image stream, context_pre_only={pre_only}",
        )
        if not pre_only:
            np.testing.assert_allclose(
                np.asarray(fctx), tctx.numpy(), atol=3e-5, rtol=3e-5,
                err_msg="context stream",
            )


# ---------------------------------------------------------------------------
# 3. CogVideoX block + 3D RoPE
# ---------------------------------------------------------------------------


def _rotate_interleaved(x: torch.Tensor) -> torch.Tensor:
    """diffusers apply_rotary_emb(use_real_unbind_dim=-1): pairs (x0, x1) →
    (-x1, x0), interleaved back."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr.unbind(-1)
    return torch.stack([-x1, x0], dim=-1).reshape(x.shape)


def _torch_apply_rope(x, cos, sin):
    return x * cos + _rotate_interleaved(x) * sin


def _cog_norm_zero(p, x, ctx, temb):
    """diffusers CogVideoXLayerNormZero: ONE shared affine LayerNorm on both
    streams; chunk order (shift, scale, gate, enc_shift, enc_scale,
    enc_gate)."""
    mod = _lin(p["linear"])(F.silu(temb))
    sh, sc, g, c_sh, c_sc, c_g = [m.unsqueeze(1) for m in mod.chunk(6, -1)]
    w, bbias = _t(p["norm"]["scale"]), _t(p["norm"]["bias"])
    nx = F.layer_norm(x, (x.shape[-1],), w, bbias, eps=1e-5)
    nc = F.layer_norm(ctx, (ctx.shape[-1],), w, bbias, eps=1e-5)
    return nx * (1 + sc) + sh, nc * (1 + c_sc) + c_sh, g, c_g


def _torch_cog_block(p, x, ctx, temb, heads, rope):
    """diffusers CogVideoXBlock: text tokens FIRST in the joint sequence;
    per-head qk LayerNorm (affine, eps 1e-6) before RoPE; RoPE rotates the
    VIDEO positions only; FF runs on the re-normed joint sequence."""
    b = x.shape[0]
    s_txt = ctx.shape[1]
    hx, hc, g, c_g = _cog_norm_zero(p["norm1"], x, ctx, temb)
    h = torch.cat([hc, hx], dim=1)
    inner = h.shape[-1]
    dh = inner // heads

    def split(t):
        return t.view(b, -1, heads, dh).transpose(1, 2)

    q, k, v = (split(_lin(p[n])(h)) for n in ("to_q", "to_k", "to_v"))
    q = F.layer_norm(q, (dh,), _t(p["norm_q"]["scale"]), _t(p["norm_q"]["bias"]),
                     eps=1e-6)
    k = F.layer_norm(k, (dh,), _t(p["norm_k"]["scale"]), _t(p["norm_k"]["bias"]),
                     eps=1e-6)
    if rope is not None:
        cos, sin = rope  # [S_vid, Dh]
        q = torch.cat(
            [q[:, :, :s_txt], _torch_apply_rope(q[:, :, s_txt:], cos, sin)],
            dim=2,
        )
        k = torch.cat(
            [k[:, :, :s_txt], _torch_apply_rope(k[:, :, s_txt:], cos, sin)],
            dim=2,
        )
    out = F.scaled_dot_product_attention(q, k, v)
    out = out.transpose(1, 2).reshape(b, -1, inner)
    out = _lin(p["to_out"])(out)
    ctx = ctx + c_g * out[:, :s_txt]
    x = x + g * out[:, s_txt:]

    hx, hc, g, c_g = _cog_norm_zero(p["norm2"], x, ctx, temb)
    h = _gelu_tanh_mlp(p["ff"], torch.cat([hc, hx], dim=1))
    ctx = ctx + c_g * h[:, :s_txt]
    x = x + g * h[:, s_txt:]
    return x, ctx


def test_cogvideox_block_matches_torch_replica():
    for use_rotary in (False, True):
        cfg = cog.CogVideoXConfig.tiny(use_rotary=use_rotary)
        block = cog.CogVideoXBlock(cfg=cfg)
        rng = np.random.default_rng(2)
        f, gh, gw = 3, 2, 2
        s_vid = f * gh * gw
        b, l, d = 2, 5, cfg.hidden
        x = rng.standard_normal((b, s_vid, d), np.float32)
        ctx = rng.standard_normal((b, l, d), np.float32)
        temb = rng.standard_normal((b, cfg.time_embed_dim), np.float32)
        rotary = None
        if use_rotary:
            cos, sin = cog.rope_3d(cfg.head_dim, f, gh, gw)
            rotary = (jnp.asarray(cos), jnp.asarray(sin))
        params = block.init(
            jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(ctx),
            jnp.asarray(temb), rotary,
        )["params"]
        fx, fctx = block.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(ctx),
            jnp.asarray(temb), rotary,
        )
        with torch.no_grad():
            rope_t = None
            if use_rotary:
                rope_t = (_t(np.asarray(rotary[0])), _t(np.asarray(rotary[1])))
            tx, tctx = _torch_cog_block(
                jax.tree.map(np.asarray, params), _t(x), _t(ctx), _t(temb),
                cfg.num_heads, rope_t,
            )
        np.testing.assert_allclose(
            np.asarray(fx), tx.numpy(), atol=3e-5, rtol=3e-5,
            err_msg=f"video stream, use_rotary={use_rotary}",
        )
        np.testing.assert_allclose(
            np.asarray(fctx), tctx.numpy(), atol=3e-5, rtol=3e-5,
            err_msg=f"text stream, use_rotary={use_rotary}",
        )


def test_rope_3d_matches_diffusers_construction():
    """rope_3d vs an independent torch construction of diffusers'
    get_3d_rotary_pos_embed: per-axis 1D freqs θ^(2i/d), grid-broadcast in
    (t, h, w) order with dims (d/4, 3d/8, 3d/8), cos/sin repeated per pair."""
    dim, f, gh, gw = 32, 3, 4, 5
    cos_j, sin_j = cog.rope_3d(dim, f, gh, gw)

    def axis_freqs(n, d):
        theta = 10000.0 ** (
            -torch.arange(0, d, 2, dtype=torch.float64) / d
        )
        ang = torch.outer(torch.arange(n, dtype=torch.float64), theta)
        return torch.repeat_interleave(ang, 2, dim=1)  # [n, d]

    dt, dh = dim // 4, dim * 3 // 8
    dw = dim - dt - dh
    ft = axis_freqs(f, dt)[:, None, None, :].expand(f, gh, gw, dt)
    fh = axis_freqs(gh, dh)[None, :, None, :].expand(f, gh, gw, dh)
    fw = axis_freqs(gw, dw)[None, None, :, :].expand(f, gh, gw, dw)
    full = torch.cat([ft, fh, fw], dim=-1).reshape(f * gh * gw, dim)
    np.testing.assert_allclose(
        cos_j, full.cos().float().numpy(), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        sin_j, full.sin().float().numpy(), atol=1e-6, rtol=1e-6
    )


# ---------------------------------------------------------------------------
# 4. SD1.5 UNet — full tiny forward
# ---------------------------------------------------------------------------


def _conv(p: dict, x, stride=1, padding=1):
    """Flax Conv params {kernel HWIO, bias} → torch F.conv2d (OIHW)."""
    w = torch.from_numpy(
        np.transpose(np.asarray(p["kernel"], np.float32), (3, 2, 0, 1)).copy()
    )
    return F.conv2d(x, w, _t(p["bias"]), stride=stride, padding=padding)


def _gn(p: dict, x, groups: int, eps: float):
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps)


def _ln_affine(p: dict, x, eps: float = 1e-5):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps)


def _torch_sd15_resblock(p, x, temb, groups):
    """diffusers ResnetBlock2D: GN(1e-5)→silu→conv3×3 → +time_emb_proj(silu
    (temb)) → GN→silu→conv3×3, 1×1 conv_shortcut on channel change."""
    h = _conv(p["conv1"], F.silu(_gn(p["norm1"], x, groups, 1e-5)))
    h = h + _lin(p["time_emb_proj"])(F.silu(temb))[:, :, None, None]
    h = _conv(p["conv2"], F.silu(_gn(p["norm2"], h, groups, 1e-5)))
    if "conv_shortcut" in p:
        x = _conv(p["conv_shortcut"], x, padding=0)
    return x + h


def _geglu_ff(ff: dict, x):
    """diffusers FeedForward(activation_fn='geglu'): proj → chunk(h, gate) →
    h · gelu(gate) with EXACT (erf) gelu — GEGLU uses F.gelu's default,
    unlike PixArt's 'gelu-approximate' tanh path."""
    h, gate = _lin(ff["proj_in"])(x).chunk(2, dim=-1)
    return _lin(ff["proj_out"])(h * F.gelu(gate))


def _torch_sd15_tblock(p, x, ctx, heads):
    """diffusers BasicTransformerBlock (SD1.5): affine pre-LN (eps 1e-5),
    self-attn → cross-attn → GEGLU FF; q/k/v have no bias, to_out does."""
    h = _ln_affine(p["norm1"], x)
    a1 = p["attn1"]
    x = x + _lin(a1["to_out"])(
        _mha(_lin(a1["to_q"])(h), _lin(a1["to_k"])(h), _lin(a1["to_v"])(h), heads)
    )
    h = _ln_affine(p["norm2"], x)
    a2 = p["attn2"]
    x = x + _lin(a2["to_out"])(
        _mha(_lin(a2["to_q"])(h), _lin(a2["to_k"])(ctx), _lin(a2["to_v"])(ctx), heads)
    )
    h = _ln_affine(p["norm3"], x)
    return x + _geglu_ff(p["ff"], h)


def _torch_sd15_spatial(p, x, ctx, groups, heads, width):
    """diffusers Transformer2DModel depth-1 (SD1.5 use_linear_projection=
    False — the 1×1 convs are math-identical to token-space linears):
    GN(1e-6) → proj_in → block → proj_out + residual."""
    res = x
    b, c, hh, ww = x.shape
    h = _gn(p["norm"], x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = _lin(p["proj_in"])(h)
    h = _torch_sd15_tblock(p["transformer_blocks_0"], h, ctx, heads)
    h = _lin(p["proj_out"])(h)
    return res + h.reshape(b, hh, ww, width).permute(0, 3, 1, 2)


def _torch_sd15_unet(params, cfg, latent, t, context):
    """Full diffusers UNet2DConditionModel forward (SD1.5 topology) from
    torch primitives, NCHW. Downsample2D = conv3×3 stride 2 SYMMETRIC
    padding 1 (the UNet config's downsample_padding=1 — distinct from the
    VAE encoder's asymmetric (0,1) pad); Upsample2D = nearest ×2 + conv3×3;
    Timesteps(width0, flip_sin_to_cos=True, freq_shift=0) → [cos, sin]."""
    widths = list(cfg.block_widths)
    n = len(widths)
    groups, heads = cfg.norm_groups, cfg.num_heads

    half = widths[0] // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    ).float()
    args = t[:, None] * freqs[None, :]
    emb = torch.cat([args.cos(), args.sin()], dim=-1)
    te = params["time_embedding"]
    temb = _lin(te["linear_2"])(F.silu(_lin(te["linear_1"])(emb)))

    x = _conv(params["conv_in"], latent)
    skips = [x]
    for i, w in enumerate(widths):
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            x = _torch_sd15_resblock(params[f"down_{i}_res_{j}"], x, temb, groups)
            if has_attn:
                x = _torch_sd15_spatial(
                    params[f"down_{i}_attn_{j}"], x, context, groups, heads, w
                )
            skips.append(x)
        if i < n - 1:
            x = _conv(params[f"down_{i}_downsample"], x, stride=2, padding=1)
            skips.append(x)

    x = _torch_sd15_resblock(params["mid_res_0"], x, temb, groups)
    x = _torch_sd15_spatial(params["mid_attn"], x, context, groups, heads, widths[-1])
    x = _torch_sd15_resblock(params["mid_res_1"], x, temb, groups)

    for i, w in enumerate(reversed(widths)):
        stage = n - 1 - i
        has_attn = stage < n - 1
        for j in range(cfg.layers_per_block + 1):
            x = torch.cat([x, skips.pop()], dim=1)
            x = _torch_sd15_resblock(params[f"up_{i}_res_{j}"], x, temb, groups)
            if has_attn:
                x = _torch_sd15_spatial(
                    params[f"up_{i}_attn_{j}"], x, context, groups, heads, w
                )
        if stage > 0:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _conv(params[f"up_{i}_upsample"], x)

    x = F.silu(_gn(params["conv_norm_out"], x, groups, 1e-5))
    return _conv(params["conv_out"], x)


def test_sd15_unet_matches_torch_replica():
    """Weight-identical full-forward agreement: every structural choice
    (temb injection, downsample padding, skip pop order, GEGLU gelu flavor,
    sinusoid ordering) must match diffusers' UNet2DConditionModel."""
    cfg = unet_sd15.UNetConfig.tiny()
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    rng = np.random.default_rng(3)
    b, hw, l = 2, 16, 6
    latent = rng.standard_normal((b, 4, hw, hw), np.float32)
    t = rng.uniform(0, 999, (b,)).astype(np.float32)
    ctx = rng.standard_normal((b, l, cfg.context_dim), np.float32)
    params = model.init(
        jax.random.PRNGKey(3), jnp.asarray(latent), jnp.asarray(t),
        jnp.asarray(ctx), None,
    )["params"]
    flax_out = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(latent), jnp.asarray(t),
            jnp.asarray(ctx), None,
        )
    )
    with torch.no_grad():
        torch_out = _torch_sd15_unet(
            jax.tree.map(np.asarray, params), cfg, _t(latent), _t(t), _t(ctx)
        ).numpy()
    np.testing.assert_allclose(flax_out, torch_out, atol=1e-4, rtol=1e-4)
