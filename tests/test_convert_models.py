"""Structural converter tests for SD3 / SD1.5-UNet / KL-VAE / CogVideoX:
synthetic state dicts in the documented HF key layout must convert to trees
structurally identical to the Flax models' init trees."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.io import convert
from tdm_tpu.models import cogvideox as cog, mmdit_sd3, unet_sd15, vae as vae_lib
from tests.test_convert import _assert_same_structure


class SDBuilder:
    def __init__(self, seed=0):
        self.sd = {}
        self.rng = np.random.default_rng(seed)

    def lin(self, name, din, dout, bias=True):
        self.sd[f"{name}.weight"] = self.rng.normal(
            size=(dout, din)
        ).astype(np.float32) * 0.02
        if bias:
            self.sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    def conv(self, name, cin, cout, k=3, bias=True):
        self.sd[f"{name}.weight"] = self.rng.normal(
            size=(cout, cin, k, k)
        ).astype(np.float32) * 0.02
        if bias:
            self.sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def norm(self, name, dim):
        self.sd[f"{name}.weight"] = np.ones(dim, np.float32)
        self.sd[f"{name}.bias"] = np.zeros(dim, np.float32)


def test_sd3_convert():
    cfg = mmdit_sd3.MMDiTConfig.tiny()
    d = cfg.hidden
    b = SDBuilder()
    b.conv("pos_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    for name in ("timestep_embedder", "text_embedder"):
        din = 256 if name == "timestep_embedder" else cfg.pooled_dim
        b.lin(f"time_text_embed.{name}.linear_1", din, d)
        b.lin(f"time_text_embed.{name}.linear_2", d, d)
    b.lin("context_embedder", cfg.context_dim, d)
    for i in range(cfg.num_layers):
        s = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        b.lin(f"{s}.norm1.linear", d, 6 * d)
        b.lin(f"{s}.norm1_context.linear", d, (2 if last else 6) * d)
        for p in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            b.lin(f"{s}.attn.{p}", d, d)
        b.lin(f"{s}.attn.to_out.0", d, d)
        if not last:
            b.lin(f"{s}.attn.to_add_out", d, d)
        b.lin(f"{s}.ff.net.0.proj", d, 4 * d)
        b.lin(f"{s}.ff.net.2", 4 * d, d)
        if not last:
            b.lin(f"{s}.ff_context.net.0.proj", d, 4 * d)
            b.lin(f"{s}.ff_context.net.2", 4 * d, d)
    b.lin("norm_out.linear", d, 2 * d)
    b.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)

    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    lat = jnp.zeros((1, cfg.in_channels, cfg.sample_size, cfg.sample_size))
    init = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)),
        jnp.zeros((1, 6, cfg.context_dim)), jnp.zeros((1, cfg.pooled_dim)),
    )["params"]
    tree = convert.to_jax(convert.sd3_params(b.sd))
    _assert_same_structure(tree, init)
    out = model.apply(
        {"params": tree}, lat, jnp.zeros((1,)),
        jnp.zeros((1, 6, cfg.context_dim)), jnp.zeros((1, cfg.pooled_dim)),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_unet_sd15_convert():
    cfg = unet_sd15.UNetConfig.tiny()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block
    temb = widths[0] * 4
    b = SDBuilder()

    def resnet(name, cin, cout):
        b.norm(f"{name}.norm1", cin)
        b.conv(f"{name}.conv1", cin, cout)
        b.lin(f"{name}.time_emb_proj", temb, cout)
        b.norm(f"{name}.norm2", cout)
        b.conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            b.conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def spatial(name, w):
        b.norm(f"{name}.norm", w)
        b.conv(f"{name}.proj_in", w, w, k=1)
        b.conv(f"{name}.proj_out", w, w, k=1)
        t = f"{name}.transformer_blocks.0"
        for j in (1, 2, 3):
            b.norm(f"{t}.norm{j}", w)
        for attn, ctx in (("attn1", w), ("attn2", cfg.context_dim)):
            b.lin(f"{t}.{attn}.to_q", w, w, bias=False)
            b.lin(f"{t}.{attn}.to_k", ctx, w, bias=False)
            b.lin(f"{t}.{attn}.to_v", ctx, w, bias=False)
            b.lin(f"{t}.{attn}.to_out.0", w, w)
        b.lin(f"{t}.ff.net.0.proj", w, 8 * w)
        b.lin(f"{t}.ff.net.2", 4 * w, w)

    b.conv("conv_in", cfg.in_channels, widths[0])
    b.lin("time_embedding.linear_1", widths[0], temb)
    b.lin("time_embedding.linear_2", temb, temb)
    ch = widths[0]
    for i, w in enumerate(widths):
        has_attn = i < n_stages - 1
        for j in range(lpb):
            resnet(f"down_blocks.{i}.resnets.{j}", ch, w)
            ch = w
            if has_attn:
                spatial(f"down_blocks.{i}.attentions.{j}", w)
        if i < n_stages - 1:
            b.conv(f"down_blocks.{i}.downsamplers.0.conv", w, w)
    resnet("mid_block.resnets.0", widths[-1], widths[-1])
    spatial("mid_block.attentions.0", widths[-1])
    resnet("mid_block.resnets.1", widths[-1], widths[-1])
    # up path: track skip channels like the model does
    skips = [widths[0]]
    for i, w in enumerate(widths):
        for j in range(lpb):
            skips.append(w)
        if i < n_stages - 1:
            skips.append(w)
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        stage = n_stages - 1 - i
        has_attn = stage < n_stages - 1
        for j in range(lpb + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", ch + skip, w)
            ch = w
            if has_attn:
                spatial(f"up_blocks.{i}.attentions.{j}", w)
        if stage > 0:
            b.conv(f"up_blocks.{i}.upsamplers.0.conv", w, w)
    b.norm("conv_norm_out", widths[0])
    b.conv("conv_out", widths[0], cfg.out_channels)

    model = unet_sd15.UNet2DCondition(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    ctx = jnp.zeros((1, 6, cfg.context_dim))
    init = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx,
        jnp.ones((1, 6), jnp.int32),
    )["params"]
    tree = convert.to_jax(
        convert.unet_sd15_params(b.sd, layers_per_block=lpb, n_stages=n_stages)
    )
    _assert_same_structure(tree, init)
    out = model.apply(
        {"params": tree}, lat, jnp.zeros((1,)), ctx, jnp.ones((1, 6), jnp.int32)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_klvae_convert():
    cfg = vae_lib.KLVAEConfig.tiny()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block
    b = SDBuilder()

    def resnet(name, cin, cout):
        b.norm(f"{name}.norm1", cin)
        b.conv(f"{name}.conv1", cin, cout)
        b.norm(f"{name}.norm2", cout)
        b.conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            b.conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def midattn(name, w):
        b.norm(f"{name}.group_norm", w)
        for p in ("to_q", "to_k", "to_v"):
            b.lin(f"{name}.{p}", w, w)
        b.lin(f"{name}.to_out.0", w, w)

    # decoder
    b.conv("decoder.conv_in", cfg.latent_channels, widths[-1])
    resnet("decoder.mid_block.resnets.0", widths[-1], widths[-1])
    midattn("decoder.mid_block.attentions.0", widths[-1])
    resnet("decoder.mid_block.resnets.1", widths[-1], widths[-1])
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            b.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", w, w)
    b.norm("decoder.conv_norm_out", widths[0])
    b.conv("decoder.conv_out", widths[0], cfg.image_channels)
    b.conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, k=1)
    # encoder
    b.conv("encoder.conv_in", cfg.image_channels, widths[0])
    ch = widths[0]
    for i, w in enumerate(widths):
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            b.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", w, w)
    resnet("encoder.mid_block.resnets.0", widths[-1], widths[-1])
    midattn("encoder.mid_block.attentions.0", widths[-1])
    resnet("encoder.mid_block.resnets.1", widths[-1], widths[-1])
    b.norm("encoder.conv_norm_out", widths[-1])
    b.conv("encoder.conv_out", widths[-1], 2 * cfg.latent_channels)
    b.conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, k=1)

    tree = convert.to_jax(
        convert.klvae_params(b.sd, layers_per_block=lpb, n_stages=n_stages)
    )
    dec = vae_lib.KLDecoder(cfg=cfg)
    z = jnp.zeros((1, cfg.latent_channels, 8, 8))
    init_d = dec.init(jax.random.PRNGKey(0), z)["params"]
    _assert_same_structure(tree["decoder"], init_d)
    assert np.isfinite(np.asarray(dec.apply({"params": tree["decoder"]}, z))).all()

    enc = vae_lib.KLEncoder(cfg=cfg)
    img = jnp.zeros((1, 3, 16, 16))
    init_e = enc.init(jax.random.PRNGKey(1), img)["params"]
    _assert_same_structure(tree["encoder"], init_e)


def test_cogvideox_convert():
    cfg = cog.CogVideoXConfig.tiny()
    d = cfg.hidden
    b = SDBuilder()
    b.conv("patch_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    b.lin("patch_embed.text_proj", cfg.text_dim, d)
    b.lin("time_embedding.linear_1", d, cfg.time_embed_dim)
    b.lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    for i in range(cfg.num_layers):
        s = f"transformer_blocks.{i}"
        for norm in ("norm1", "norm2"):
            b.lin(f"{s}.{norm}.linear", cfg.time_embed_dim, 6 * d)
            b.norm(f"{s}.{norm}.norm", d)
        for p in ("to_q", "to_k", "to_v"):
            b.lin(f"{s}.attn1.{p}", d, d)
        b.norm(f"{s}.attn1.norm_q", cfg.head_dim)
        b.norm(f"{s}.attn1.norm_k", cfg.head_dim)
        b.lin(f"{s}.attn1.to_out.0", d, d)
        b.lin(f"{s}.ff.net.0.proj", d, 4 * d)
        b.lin(f"{s}.ff.net.2", 4 * d, d)
    b.norm("norm_final", d)
    b.lin("norm_out.linear", cfg.time_embed_dim, 2 * d)
    b.norm("norm_out.norm", d)
    b.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)

    model = cog.CogVideoXTransformer3D(cfg=cfg)
    lat = jnp.zeros((1, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w))
    text = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
    init = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)["params"]
    tree = convert.to_jax(convert.cogvideox_params(b.sd))
    _assert_same_structure(tree, init)
    out = model.apply({"params": tree}, lat, jnp.zeros((1,)), text)
    assert np.isfinite(np.asarray(out)).all()


def test_vae3d_decoder_convert():
    from tdm_tpu.models import vae3d

    cfg = vae3d.VAE3DConfig.tiny()
    widths = list(cfg.block_widths)
    n_stages = len(widths)
    lpb = cfg.layers_per_block
    b = SDBuilder()

    def cconv(name, cin, cout, kt=3):
        b.sd[f"{name}.conv.weight"] = b.rng.normal(
            size=(cout, cin, kt, 3, 3)).astype(np.float32) * 0.02
        b.sd[f"{name}.conv.bias"] = np.zeros(cout, np.float32)

    def resnet(name, cin, cout):
        b.norm(f"{name}.norm1", cin)
        cconv(f"{name}.conv1", cin, cout)
        b.norm(f"{name}.norm2", cout)
        cconv(f"{name}.conv2", cout, cout)
        if cin != cout:
            # 1×1×1 shortcut (plain conv in our model)
            b.sd[f"{name}.conv_shortcut.conv.weight"] = b.rng.normal(
                size=(cout, cin, 1, 1, 1)).astype(np.float32) * 0.02
            b.sd[f"{name}.conv_shortcut.conv.bias"] = np.zeros(cout, np.float32)

    cconv("decoder.conv_in", cfg.latent_channels, widths[-1])
    resnet("decoder.mid_block.resnets.0", widths[-1], widths[-1])
    resnet("decoder.mid_block.resnets.1", widths[-1], widths[-1])
    ch = widths[-1]
    for i, w in enumerate(reversed(widths)):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, w)
            ch = w
        if i < n_stages - 1:
            b.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", w, w)
    b.norm("decoder.norm_out", widths[0])
    cconv("decoder.conv_out", widths[0], cfg.image_channels)

    tree = convert.to_jax(
        convert.vae3d_decoder_params(b.sd, layers_per_block=lpb,
                                     n_stages=n_stages)
    )
    dec = vae3d.VAE3DDecoder(cfg=cfg)
    z = jnp.zeros((1, cfg.latent_channels, 3, 6, 6))
    init = dec.init(jax.random.PRNGKey(0), z)["params"]
    _assert_same_structure(tree, init)
    out = dec.apply({"params": tree}, z)
    assert np.isfinite(np.asarray(out)).all()


def test_strict_accounting_rejects_unknown_and_missing_keys():
    """Converter fidelity guard (round-1 gap): a RENAMED checkpoint key must
    fail loudly in both directions — the old name is a leftover (ValueError)
    and the expected name is missing (KeyError naming the family)."""
    import pytest

    cfg = mmdit_sd3.MMDiTConfig.tiny()
    d = cfg.hidden
    b = SDBuilder()
    b.conv("pos_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    for name in ("timestep_embedder", "text_embedder"):
        din = 256 if name == "timestep_embedder" else cfg.pooled_dim
        b.lin(f"time_text_embed.{name}.linear_1", din, d)
        b.lin(f"time_text_embed.{name}.linear_2", d, d)
    b.lin("context_embedder", cfg.context_dim, d)
    for i in range(cfg.num_layers):
        s = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        b.lin(f"{s}.norm1.linear", d, 6 * d)
        b.lin(f"{s}.norm1_context.linear", d, (2 if last else 6) * d)
        for p in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            b.lin(f"{s}.attn.{p}", d, d)
        b.lin(f"{s}.attn.to_out.0", d, d)
        if not last:
            b.lin(f"{s}.attn.to_add_out", d, d)
        b.lin(f"{s}.ff.net.0.proj", d, 4 * d)
        b.lin(f"{s}.ff.net.2", 4 * d, d)
        if not last:
            b.lin(f"{s}.ff_context.net.0.proj", d, 4 * d)
            b.lin(f"{s}.ff_context.net.2", 4 * d, d)
    b.lin("norm_out.linear", d, 2 * d)
    b.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)

    convert.sd3_params(b.sd)  # complete dict converts fine

    # unknown extra key → leftover error (would be silently dropped before)
    extra = dict(b.sd)
    extra["transformer_blocks.0.attn.to_q_new.weight"] = (
        extra["transformer_blocks.0.attn.to_q.weight"]
    )
    with pytest.raises(ValueError, match="never consumed"):
        convert.sd3_params(extra)
    convert.sd3_params(extra, strict=False)  # explicit opt-out still works

    # required key renamed away → KeyError naming the family
    renamed = dict(extra)
    del renamed["transformer_blocks.0.attn.to_q.weight"]
    with pytest.raises(KeyError, match="sd3 converter"):
        convert.sd3_params(renamed)

    # an OPTIONAL key ('in sd' probe) renamed away is now caught too: the
    # original lands in leftovers instead of vanishing
    opt = dict(b.sd)
    opt["transformer_blocks.0.attn.to_add_out_v2.weight"] = opt.pop(
        "transformer_blocks.0.attn.to_add_out.weight"
    )
    with pytest.raises(ValueError, match="never consumed"):
        convert.sd3_params(opt)

    # ignore patterns: known non-weight buffers do not trip strictness
    with_buf = dict(b.sd)
    with_buf["pos_embed.pos_embed"] = np.zeros((1, 4, d), np.float32)
    convert.sd3_params(with_buf)


def _build_sd3_dict(cfg, dual_layers=()):
    d = cfg.hidden
    b = SDBuilder()
    b.conv("pos_embed.proj", cfg.in_channels, d, k=cfg.patch_size)
    for name in ("timestep_embedder", "text_embedder"):
        din = 256 if name == "timestep_embedder" else cfg.pooled_dim
        b.lin(f"time_text_embed.{name}.linear_1", din, d)
        b.lin(f"time_text_embed.{name}.linear_2", d, d)
    b.lin("context_embedder", cfg.context_dim, d)
    for i in range(cfg.num_layers):
        s = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        dual = i in dual_layers
        b.lin(f"{s}.norm1.linear", d, (9 if dual else 6) * d)
        b.lin(f"{s}.norm1_context.linear", d, (2 if last else 6) * d)
        for p in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            b.lin(f"{s}.attn.{p}", d, d)
        b.lin(f"{s}.attn.to_out.0", d, d)
        if not last:
            b.lin(f"{s}.attn.to_add_out", d, d)
        if cfg.qk_norm == "rms":
            for qk in ("norm_q", "norm_k"):  # RMSNorm: weight only, no bias
                b.sd[f"{s}.attn.{qk}.weight"] = b.rng.normal(
                    size=(cfg.head_dim,)).astype(np.float32)
        if dual:
            for p in ("to_q", "to_k", "to_v"):
                b.lin(f"{s}.attn2.{p}", d, d)
            b.lin(f"{s}.attn2.to_out.0", d, d)
            if cfg.qk_norm == "rms":
                for qk in ("norm_q", "norm_k"):
                    b.sd[f"{s}.attn2.{qk}.weight"] = b.rng.normal(
                        size=(cfg.head_dim,)).astype(np.float32)
        b.lin(f"{s}.ff.net.0.proj", d, 4 * d)
        b.lin(f"{s}.ff.net.2", 4 * d, d)
        if not last:
            b.lin(f"{s}.ff_context.net.0.proj", d, 4 * d)
            b.lin(f"{s}.ff_context.net.2", 4 * d, d)
    b.lin("norm_out.linear", d, 2 * d)
    b.lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)
    return b.sd


def test_sd35_dual_attention_convert_and_scan_parity():
    """SD3.5 dual attention (VERDICT r1 #8): blocks 0..d-1 carry an extra
    image-stream self-attention with a 9-way AdaLN. The converter splits
    the checkpoint into 'blocks_dual' + 'blocks' stacks; scan and unrolled
    layouts must agree numerically on the same weights."""
    import dataclasses

    base = mmdit_sd3.MMDiTConfig.tiny()
    cfg = dataclasses.replace(
        base, num_layers=4, qk_norm="rms", dual_attention_layers=(0, 1)
    )
    sd = _build_sd3_dict(cfg, dual_layers=(0, 1))

    lat = jnp.zeros((2, cfg.in_channels, cfg.sample_size, cfg.sample_size))
    t = jnp.array([500.0, 100.0])
    ctx = jax.random.normal(jax.random.PRNGKey(0), (2, 6, cfg.context_dim)) * 0.1
    pooled = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.pooled_dim)) * 0.1

    # scan layout: structure matches init, forward runs
    model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
    init = model.init(jax.random.PRNGKey(2), lat, t, ctx, pooled)["params"]
    assert "blocks_dual" in init and "blocks" in init
    tree = convert.to_jax(convert.sd3_params(sd))
    _assert_same_structure(tree, init)
    out_scan = model.apply({"params": tree}, lat, t, ctx, pooled)

    # unrolled layout on the SAME weights agrees
    cfg_u = dataclasses.replace(cfg, scan_layers=False)
    model_u = mmdit_sd3.SD3Transformer2D(cfg=cfg_u)
    tree_u = convert.to_jax(convert.sd3_params(sd, scan_layers=False))
    out_u = model_u.apply({"params": tree_u}, lat, t, ctx, pooled)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_u), atol=2e-5, rtol=2e-5
    )

    # dual weights actually matter: zeroing attn2's output proj changes out
    import jax as _jax
    tree_z = _jax.tree.map(lambda x: x, tree)  # shallow copy
    tree_z["blocks_dual"]["attn2"]["to_out"]["kernel"] = jnp.zeros_like(
        tree_z["blocks_dual"]["attn2"]["to_out"]["kernel"]
    )
    out_z = model.apply({"params": tree_z}, lat, t, ctx, pooled)
    assert float(jnp.abs(out_z - out_scan).max()) > 1e-6

    # non-contiguous dual set must refuse to stack
    import pytest
    sd_bad = _build_sd3_dict(cfg, dual_layers=(1, 2))
    with pytest.raises(ValueError, match="contiguous"):
        convert.sd3_params(sd_bad)


def test_sd35_medium_preset_shape():
    """The preset encodes the HF stable-diffusion-3.5-medium block layout."""
    cfg = mmdit_sd3.MMDiTConfig.sd35_medium()
    assert cfg.num_layers == 23
    assert cfg.dual_attention_layers == tuple(range(13))
    assert cfg.qk_norm == "rms"
    assert cfg.pos_embed_max_size == 384
