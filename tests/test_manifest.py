"""Manifest loop tests: io/manifest.py's expected inventories must be
EXACTLY what the strict converters consume and what the Flax models need —
synthetic state dicts built from each manifest convert cleanly (strict
accounting errors on both unconsumed and missing keys) and land structurally
identical to the model init trees. Plus the header-only safetensors reader,
the check_manifest report, and the committed real-config manifests.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.io import convert, manifest
from tdm_tpu.models import (
    cogvideox as cog,
    mmdit_sd3,
    pixart,
    unet_sd15,
    vae as vae_lib,
    vae3d,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "manifests")


def _sig(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): tuple(x.shape) for p, x in flat}


def _assert_structural(converted, init):
    a, b = _sig(converted), _sig(init)
    assert sorted(a) == sorted(b), (
        f"missing: {sorted(set(b) - set(a))}\nextra: {sorted(set(a) - set(b))}"
    )
    bad = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not bad, f"shape mismatches: {bad}"


# ---------------------------------------------------------------------------
# manifest → converter → model, per family (tiny configs)
# ---------------------------------------------------------------------------


def test_pixart_manifest_feeds_converter_and_model():
    cfg = pixart.PixArtConfig.tiny()
    sd = manifest.synthetic_state_dict("pixart", cfg)
    tree = convert.to_jax(convert.pixart_params(sd))
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    init = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text,
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    _assert_structural(tree, init)


def test_sd3_manifest_feeds_converter_and_model():
    for cfg in (
        mmdit_sd3.MMDiTConfig.tiny(),
        # qk-norm + dual-attention prefix (SD3.5-medium shape, tiny dims)
        mmdit_sd3.MMDiTConfig(
            sample_size=8, num_layers=3, num_heads=2, head_dim=16,
            context_dim=48, pooled_dim=24, pos_embed_max_size=16,
            qk_norm="rms", dual_attention_layers=(0,),
            dtype=jnp.float32, attn_impl="xla",
        ),
    ):
        sd = manifest.synthetic_state_dict("sd3", cfg)
        tree = convert.to_jax(convert.sd3_params(sd))
        model = mmdit_sd3.SD3Transformer2D(cfg=cfg)
        lat = jnp.zeros((1, cfg.in_channels, cfg.sample_size, cfg.sample_size))
        init = model.init(
            jax.random.PRNGKey(0), lat, jnp.zeros((1,)),
            jnp.zeros((1, 6, cfg.context_dim)), jnp.zeros((1, cfg.pooled_dim)),
        )["params"]
        _assert_structural(tree, init)


def test_unet_manifest_feeds_converter_and_model():
    cfg = unet_sd15.UNetConfig.tiny()
    sd = manifest.synthetic_state_dict("unet_sd15", cfg)
    tree = convert.to_jax(
        convert.unet_sd15_params(
            sd, layers_per_block=cfg.layers_per_block,
            n_stages=len(cfg.block_widths),
        )
    )
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 6, cfg.context_dim)), jnp.ones((1, 6), jnp.int32),
    )["params"]
    _assert_structural(tree, init)


def test_klvae_manifest_feeds_converter_and_model():
    cfg = vae_lib.KLVAEConfig.tiny()
    sd = manifest.synthetic_state_dict("klvae", cfg)
    tree = convert.to_jax(
        convert.klvae_params(
            sd, layers_per_block=cfg.layers_per_block,
            n_stages=len(cfg.block_widths),
        )
    )
    dec = vae_lib.KLDecoder(cfg=cfg)
    init_d = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.latent_channels, 8, 8))
    )["params"]
    _assert_structural(tree["decoder"], init_d)
    enc = vae_lib.KLEncoder(cfg=cfg)
    init_e = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 16, 16)))["params"]
    _assert_structural(tree["encoder"], init_e)


def test_cogvideox_manifest_feeds_converter_and_model():
    cfg = cog.CogVideoXConfig.tiny()
    sd = manifest.synthetic_state_dict("cogvideox", cfg)
    tree = convert.to_jax(convert.cogvideox_params(sd))
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w)),
        jnp.zeros((1,)),
        jnp.zeros((1, cfg.max_text_len, cfg.text_dim)),
    )["params"]
    _assert_structural(tree, init)


def test_vae3d_manifest_feeds_converter_and_model():
    cfg = vae3d.VAE3DConfig.tiny()
    sd = manifest.synthetic_state_dict("vae3d_decoder", cfg)
    tree = convert.to_jax(
        convert.vae3d_decoder_params(
            sd, layers_per_block=cfg.layers_per_block,
            n_stages=len(cfg.block_widths),
        )
    )
    dec = vae3d.VAE3DDecoder(cfg=cfg)
    init = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.latent_channels, 3, 6, 6))
    )["params"]
    _assert_structural(tree, init)


def test_taesd_manifest_feeds_converter_and_model():
    cfg = vae_lib.TAESDConfig(width=8, num_stages=2, blocks_per_stage=2)
    sd = manifest.synthetic_state_dict("taesd", cfg)
    tree = convert.to_jax(
        convert.taesd_params(
            sd, num_stages=cfg.num_stages,
            blocks_per_stage=cfg.blocks_per_stage,
        )
    )
    dec = vae_lib.TAESDDecoder(cfg=cfg)
    init_d = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.latent_channels, 8, 8))
    )["params"]
    _assert_structural(tree["decoder"], init_d)
    enc = vae_lib.TAESDEncoder(cfg=cfg)
    init_e = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 32, 32)))["params"]
    _assert_structural(tree["encoder"], init_e)


# ---------------------------------------------------------------------------
# header-only safetensors reading + check report
# ---------------------------------------------------------------------------


def test_read_safetensors_manifest_header_only(tmp_path):
    from safetensors.numpy import save_file

    sd = {"a.weight": np.zeros((3, 4), np.float32), "b": np.ones(5, np.float16)}
    p = str(tmp_path / "m.safetensors")
    save_file(sd, p)
    m = manifest.read_safetensors_manifest(p)
    assert m == {"a.weight": (3, 4), "b": (5,)}
    # directory of shards
    save_file({"c": np.zeros((2,), np.float32)}, str(tmp_path / "m2.safetensors"))
    m = manifest.read_safetensors_manifest(str(tmp_path))
    assert set(m) == {"a.weight", "b", "c"}


def test_check_manifest_reports_rename_shape_and_extra():
    cfg = pixart.PixArtConfig.tiny()
    good = manifest.expected_manifest("pixart", cfg)
    assert manifest.check_manifest("pixart", good, cfg) == []
    # ignored keys (1024-model micro-conditioning) are accepted silently
    withextra = dict(good)
    withextra["adaln_single.emb.resolution_embedder.linear_1.weight"] = (8, 8)
    assert manifest.check_manifest("pixart", withextra, cfg) == []

    bad = dict(good)
    v = bad.pop("proj_out.weight")
    bad["projection_out.weight"] = v  # rename
    bad["transformer_blocks.0.attn1.to_q.weight"] = (7, 7)  # wrong shape
    problems = manifest.check_manifest("pixart", bad, cfg)
    text = "\n".join(problems)
    assert "missing key: proj_out.weight" in text
    assert "unexpected key: projection_out.weight" in text
    assert "shape mismatch: transformer_blocks.0.attn1.to_q.weight" in text


def test_check_manifest_strip_prefix():
    cfg = pixart.PixArtConfig.tiny()
    nested = {
        f"transformer.{k}": v
        for k, v in manifest.expected_manifest("pixart", cfg).items()
    }
    assert manifest.check_manifest(
        "pixart", nested, cfg, strip_prefix="transformer."
    ) == []


def test_manifest_json_roundtrip(tmp_path):
    m = manifest.expected_manifest("taesd")
    p = str(tmp_path / "taesd.json")
    manifest.save_manifest(m, p)
    assert manifest.load_manifest(p) == m


# ---------------------------------------------------------------------------
# committed real-config manifests stay in sync with the generators
# ---------------------------------------------------------------------------

_COMMITTED = {
    "pixart_xl2_512.json": ("pixart", None),
    "sd3_medium.json": ("sd3", None),
    "sd15_unet.json": ("unet_sd15", None),
    "cogvideox_2b_transformer.json": ("cogvideox", None),
    "sd15_klvae.json": ("klvae", None),
    "cogvideox_vae_decoder.json": ("vae3d_decoder", None),
    "taesd.json": ("taesd", None),
    "taesd3.json": ("taesd3", None),
}


@pytest.mark.parametrize("fname", sorted(_COMMITTED))
def test_committed_manifests_in_sync(fname):
    """tests/fixtures/manifests/*.json (the recipe checkpoints' expected
    inventories, README.md:45-57,95-98,114-138) must equal a fresh
    expected_manifest — guards silent converter/model drift."""
    family, cfg = _COMMITTED[fname]
    path = os.path.join(FIXDIR, fname)
    assert os.path.exists(path), (
        f"{path} missing — regenerate with "
        "`python scripts/record_parity_fixtures.py --write-expected-manifests`"
    )
    with open(path) as f:
        committed = {k: tuple(v) for k, v in json.load(f).items()}
    assert committed == manifest.expected_manifest(family, cfg), fname


def test_cli_check_manifest(tmp_path, capsys):
    """tdm-convert --check-manifest: OK on a faithful safetensors header,
    exit 1 + report on a renamed key — the first-contact dry check."""
    from safetensors.numpy import save_file

    from tdm_tpu.cli import convert_checkpoint

    cfg = vae_lib.TAESDConfig(width=8, num_stages=2, blocks_per_stage=2)
    sd = manifest.synthetic_state_dict("taesd", cfg)
    good = str(tmp_path / "taesd.safetensors")
    save_file(sd, good)
    # shapes come from the tiny cfg, so check against a matching manifest
    # via JSON (the CLI's default expectation is the REAL config)
    mpath = str(tmp_path / "m.json")
    manifest.save_manifest(manifest.read_safetensors_manifest(good), mpath)
    problems = manifest.check_manifest(
        "taesd", manifest.load_manifest(mpath), cfg
    )
    assert problems == []

    # CLI path with the real-config default: a real-shaped dict passes...
    real = manifest.expected_manifest("taesd")
    manifest.save_manifest(real, mpath)
    convert_checkpoint.main(["--family", "taesd", "--check-manifest", mpath])
    assert "OK" in capsys.readouterr().out

    # ...and a renamed key fails with a report naming it
    bad = dict(real)
    bad["decoder.layers.0.weight_RENAMED"] = bad.pop("decoder.layers.0.weight")
    manifest.save_manifest(bad, mpath)
    with pytest.raises(SystemExit):
        convert_checkpoint.main(
            ["--family", "taesd", "--check-manifest", mpath]
        )
    out = capsys.readouterr().out
    assert "missing key: decoder.layers.0.weight" in out
    assert "unexpected key: decoder.layers.0.weight_RENAMED" in out
