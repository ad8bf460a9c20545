"""Param safetensors IO + convert CLI round-trip."""

import jax.numpy as jnp
import numpy as np

from tdm_tpu.io import params as params_io


def test_params_roundtrip(tmp_path):
    tree = {
        "blocks": {"attn": {"kernel": np.random.default_rng(0).normal(
            size=(3, 8, 8)).astype(np.float32)}},
        "bias": np.zeros(4, np.float32),
    }
    f = str(tmp_path / "p.safetensors")
    params_io.save_params(tree, f)
    back = params_io.load_params(f)
    np.testing.assert_allclose(
        np.asarray(back["blocks"]["attn"]["kernel"]),
        tree["blocks"]["attn"]["kernel"],
    )
    assert isinstance(back["bias"], jnp.ndarray)


def test_convert_cli_pixart(tmp_path):
    from safetensors.numpy import save_file

    from tdm_tpu.cli import convert_checkpoint
    from tdm_tpu.models import pixart
    from tests.test_convert import synthetic_pixart_sd

    cfg = pixart.PixArtConfig.tiny()
    src = str(tmp_path / "hf.safetensors")
    save_file(synthetic_pixart_sd(cfg), src)
    dst = str(tmp_path / "out.safetensors")
    convert_checkpoint.main(
        ["--family", "pixart", "--src", src, "--dst", dst]
    )
    tree = params_io.load_params(dst)
    # scanned layout by default
    assert tree["blocks"]["attn1"]["to_q"]["kernel"].ndim == 3
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, cfg.sample_size, cfg.sample_size))
    out = model.apply(
        {"params": tree}, lat, jnp.zeros((1,)),
        jnp.zeros((1, 8, cfg.caption_dim)), jnp.ones((1, 8), jnp.int32),
    )
    assert np.isfinite(np.asarray(out)).all()
