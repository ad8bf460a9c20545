"""Converter structural tests: synthetic HF-layout state dicts must convert
to trees that are structurally IDENTICAL (treedef + leaf shapes) to the Flax
models' init trees — the guarantee that real checkpoint ports load cleanly.
(T5/CLIP converters additionally have live numerical parity tests in
test_text_encoders.py.)"""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.io import convert
from tdm_tpu.models import pixart, vae as vae_lib


def _tree_signature(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(p), tuple(x.shape)) for p, x in flat]


def _assert_same_structure(converted, init):
    a, b = _tree_signature(converted), _tree_signature(init)
    assert sorted(dict(a)) == sorted(dict(b)), (
        f"missing: {sorted(set(dict(b)) - set(dict(a)))}\n"
        f"extra: {sorted(set(dict(a)) - set(dict(b)))}"
    )
    da, db = dict(a), dict(b)
    mismatched = {k: (da[k], db[k]) for k in da if da[k] != db[k]}
    assert not mismatched, f"shape mismatches: {mismatched}"


def synthetic_pixart_sd(cfg: pixart.PixArtConfig) -> dict:
    """HF diffusers key layout with torch shapes for a given config."""
    rng = np.random.default_rng(0)
    d = cfg.hidden
    p = cfg.patch_size
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.normal(size=(dout, din)).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    sd["pos_embed.proj.weight"] = rng.normal(
        size=(d, cfg.in_channels, p, p)
    ).astype(np.float32) * 0.02
    sd["pos_embed.proj.bias"] = np.zeros(d, np.float32)
    lin("adaln_single.emb.timestep_embedder.linear_1", 256, d)
    lin("adaln_single.emb.timestep_embedder.linear_2", d, d)
    lin("adaln_single.linear", d, 6 * d)
    lin("caption_projection.linear_1", cfg.caption_dim, d)
    lin("caption_projection.linear_2", d, d)
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        sd[f"{b}.scale_shift_table"] = rng.normal(size=(6, d)).astype(np.float32)
        for attn in ("attn1", "attn2"):
            for pnm in ("to_q", "to_k", "to_v"):
                lin(f"{b}.{attn}.{pnm}", d, d)
            lin(f"{b}.{attn}.to_out.0", d, d)
        lin(f"{b}.ff.net.0.proj", d, cfg.mlp_ratio * d)
        lin(f"{b}.ff.net.2", cfg.mlp_ratio * d, d)
    sd["scale_shift_table"] = rng.normal(size=(2, d)).astype(np.float32)
    lin("proj_out", d, p * p * cfg.out_channels)
    return sd


def test_pixart_convert_structure_and_apply():
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask)[
        "params"
    ]
    converted = convert.to_jax(convert.pixart_params(synthetic_pixart_sd(cfg)))
    _assert_same_structure(converted, init)
    out = model.apply({"params": converted}, lat, jnp.zeros((1,)), text, mask)
    assert out.shape == (1, cfg.out_channels, cfg.sample_size, cfg.sample_size)
    assert np.isfinite(np.asarray(out)).all()


def synthetic_taesd_sd(cfg: vae_lib.TAESDConfig) -> dict:
    rng = np.random.default_rng(1)
    w = cfg.width
    sd = {}

    def conv(name, cin, cout, k=3, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(
            np.float32
        ) * 0.02
        if bias:
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def blk(name, cin, cout):
        conv(f"{name}.conv.0", cin, cout)
        conv(f"{name}.conv.2", cout, cout)
        conv(f"{name}.conv.4", cout, cout)
        if cin != cout:
            conv(f"{name}.skip", cin, cout, k=1, bias=False)

    # decoder: conv_in, relu, [3 blocks, up, conv]×stages, block, conv_out
    idx = 0
    conv(f"decoder.layers.{idx}", cfg.latent_channels, w); idx += 2
    for s in range(cfg.num_stages):
        for b in range(cfg.blocks_per_stage):
            blk(f"decoder.layers.{idx}", w, w); idx += 1
        idx += 1  # upsample
        conv(f"decoder.layers.{idx}", w, w); sd.pop(f"decoder.layers.{idx}.bias")
        idx += 1
    blk(f"decoder.layers.{idx}", w, w); idx += 1
    conv(f"decoder.layers.{idx}", w, cfg.image_channels)
    # encoder: conv_in, block, [down, 3 blocks]×stages, conv_out
    idx = 0
    conv(f"encoder.layers.{idx}", cfg.image_channels, w); idx += 1
    blk(f"encoder.layers.{idx}", w, w); idx += 1
    for s in range(cfg.num_stages):
        conv(f"encoder.layers.{idx}", w, w)
        sd.pop(f"encoder.layers.{idx}.bias"); idx += 1
        for b in range(cfg.blocks_per_stage):
            blk(f"encoder.layers.{idx}", w, w); idx += 1
    conv(f"encoder.layers.{idx}", w, cfg.latent_channels)
    return sd


def test_taesd_convert_structure_and_apply():
    cfg = vae_lib.TAESDConfig(width=8, num_stages=2, blocks_per_stage=2)
    sd = synthetic_taesd_sd(cfg)
    tree = convert.to_jax(
        convert.taesd_params(sd, num_stages=2, blocks_per_stage=2)
    )
    dec = vae_lib.TAESDDecoder(cfg=cfg)
    z = jnp.zeros((1, cfg.latent_channels, 8, 8))
    init_dec = dec.init(jax.random.PRNGKey(0), z)["params"]
    _assert_same_structure(tree["decoder"], init_dec)
    out = dec.apply({"params": tree["decoder"]}, z)
    assert out.shape == (1, 3, 8 * 2**cfg.num_stages, 8 * 2**cfg.num_stages)

    enc = vae_lib.TAESDEncoder(cfg=cfg)
    img = jnp.zeros((1, 3, 32, 32))
    init_enc = enc.init(jax.random.PRNGKey(1), img)["params"]
    _assert_same_structure(tree["encoder"], init_enc)
    lat = enc.apply({"params": tree["encoder"]}, img)
    assert lat.shape == (1, cfg.latent_channels, 8, 8)


def test_pixart_reverse_roundtrip():
    """pixart_to_torch is the exact inverse of pixart_params: HF state dict
    → tree (stacked AND unrolled) → HF state dict is byte-identical — a
    distilled student loads back into diffusers unmodified."""
    cfg = pixart.PixArtConfig.tiny()
    sd = synthetic_pixart_sd(cfg)
    for scan in (True, False):
        tree = convert.pixart_params(sd, scan_layers=scan)
        back = convert.pixart_to_torch(tree)
        assert sorted(back) == sorted(sd)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_reverse_cli(tmp_path):
    """--reverse: tdm param file → torch-layout safetensors, loadable by
    pixart_params again; unsupported families error with guidance."""
    import pytest

    from tdm_tpu.cli import convert_checkpoint
    from tdm_tpu.io import params as params_io

    cfg = pixart.PixArtConfig.tiny()
    sd = synthetic_pixart_sd(cfg)
    tree = convert.pixart_params(sd)
    src = str(tmp_path / "student.tdm.safetensors")
    dst = str(tmp_path / "student.torch.safetensors")
    params_io.save_params(tree, src)
    convert_checkpoint.main(
        ["--family", "pixart", "--src", src, "--dst", dst, "--reverse"]
    )
    from safetensors.numpy import load_file

    back = load_file(dst)
    assert sorted(back) == sorted(sd)
    np.testing.assert_array_equal(back["proj_out.weight"], sd["proj_out.weight"])

    with pytest.raises(SystemExit):
        convert_checkpoint.main(
            ["--family", "sd3", "--src", src, "--dst", dst, "--reverse"]
        )
