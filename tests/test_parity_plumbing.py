"""Schema-plumbing round-trip for the parity-fixture pipeline on SYNTHETIC
stand-ins (no diffusers needed) — so the machinery is proven end-to-end
in-image and real fixtures flip the full checks green the moment they are
committed (VERDICT r4 next-#7).

What this pins (and what it deliberately does not):
  * pins: the capture script's npz WRITER (`_save_npz`) and the consumer
    (`parity_common.check_fixture`) agree on the schema — key layout,
    config_json plumb-through, per-block activation matching, state-dict
    embedding, converter invocation per family;
  * does NOT pin numerics against diffusers — the "expected" activations
    here come from the Flax models themselves over manifest-derived
    synthetic HF state dicts. Independent numerics are pinned at block
    level by test_torch_block_parity.py and, once recorded, by real
    fixtures in tests/fixtures/parity/.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parity_common import check_fixture
from tdm_tpu.io import convert, manifest


def _capture_script():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "record_parity_fixtures.py"
    )
    spec = importlib.util.spec_from_file_location("record_parity_fixtures", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # top level needs only stdlib + numpy
    return mod


@pytest.fixture(scope="module")
def save_npz():
    return _capture_script()._save_npz


def test_pixart_synthetic_fixture_roundtrip(tmp_path, save_npz):
    """pixart: per-block activations + final output through the full
    writer→reader→converter→model chain."""
    from tdm_tpu.models import pixart

    cfg = pixart.PixArtConfig.tiny()
    sd = manifest.synthetic_state_dict("pixart", cfg)
    tree = convert.to_jax(convert.pixart_params(sd, scan_layers=False))
    mcfg_unscanned = pixart.PixArtConfig(
        sample_size=cfg.sample_size, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads, head_dim=cfg.head_dim,
        caption_dim=cfg.caption_dim, dtype=jnp.float32,
        attn_impl="xla", scan_layers=False,
    )
    model = pixart.PixArtTransformer2D(cfg=mcfg_unscanned)
    rng = np.random.default_rng(0)
    b, l = 2, 8
    latent = rng.standard_normal(
        (b, 4, cfg.sample_size, cfg.sample_size), np.float32
    )
    t = rng.uniform(0, 999, (b,)).astype(np.float32)
    text = rng.standard_normal((b, l, cfg.caption_dim), np.float32)
    out, state = model.apply(
        {"params": tree}, jnp.asarray(latent), jnp.asarray(t),
        jnp.asarray(text), None,
        capture_intermediates=lambda mdl, _m: isinstance(mdl, pixart.PixArtBlock),
        mutable=["intermediates"],
    )
    acts = [
        np.asarray(
            state["intermediates"][f"blocks_{i}"]["__call__"][0], np.float32
        )
        for i in range(mcfg_unscanned.num_layers)
    ]
    path = str(tmp_path / "pixart_tiny.npz")
    save_npz(
        path, "pixart",
        dict(sample_size=cfg.sample_size, num_layers=cfg.num_layers,
             num_heads=cfg.num_heads, head_dim=cfg.head_dim,
             caption_dim=cfg.caption_dim),
        dict(latent=latent, t=t, text=text),
        acts, [None] * len(acts), np.asarray(out, np.float32), sd,
    )
    check_fixture(path)


def test_unet_sd15_synthetic_fixture_roundtrip(tmp_path, save_npz):
    """unet_sd15: final-output fixture (the consumer checks no per-block
    acts for this family) through writer→reader→converter→model."""
    from tdm_tpu.models import unet_sd15

    cfg = unet_sd15.UNetConfig.tiny()
    sd = manifest.synthetic_state_dict("unet_sd15", cfg)
    tree = convert.to_jax(
        convert.unet_sd15_params(
            sd, layers_per_block=cfg.layers_per_block,
            n_stages=len(cfg.block_widths),
        )
    )
    model = unet_sd15.UNet2DCondition(cfg=cfg)
    rng = np.random.default_rng(1)
    b, l = 2, 6
    latent = rng.standard_normal((b, 4, 16, 16), np.float32)
    t = rng.uniform(0, 999, (b,)).astype(np.float32)
    context = rng.standard_normal((b, l, cfg.context_dim), np.float32)
    out = model.apply(
        {"params": tree}, jnp.asarray(latent), jnp.asarray(t),
        jnp.asarray(context), jnp.ones((b, l), jnp.int32),
    )
    path = str(tmp_path / "sd15_unet_tiny.npz")
    save_npz(
        path, "unet_sd15",
        dict(block_widths=list(cfg.block_widths),
             layers_per_block=cfg.layers_per_block,
             context_dim=cfg.context_dim, norm_groups=cfg.norm_groups),
        dict(latent=latent, t=t, context=context),
        [], [], np.asarray(out, np.float32), sd,
    )
    check_fixture(path)


def test_checker_catches_wrong_activations(tmp_path, save_npz):
    """A deliberately corrupted final output must FAIL the checker — guards
    against the round-trip degenerating into compare-nothing."""
    from tdm_tpu.models import unet_sd15

    cfg = unet_sd15.UNetConfig.tiny()
    sd = manifest.synthetic_state_dict("unet_sd15", cfg)
    rng = np.random.default_rng(2)
    b, l = 1, 4
    latent = rng.standard_normal((b, 4, 16, 16), np.float32)
    t = np.zeros((b,), np.float32)
    context = rng.standard_normal((b, l, cfg.context_dim), np.float32)
    path = str(tmp_path / "bad.npz")
    save_npz(
        path, "unet_sd15",
        dict(block_widths=list(cfg.block_widths),
             layers_per_block=cfg.layers_per_block,
             context_dim=cfg.context_dim, norm_groups=cfg.norm_groups),
        dict(latent=latent, t=t, context=context),
        [], [], np.full((b, 4, 16, 16), 123.0, np.float32), sd,
    )
    with pytest.raises(AssertionError):
        check_fixture(path)
