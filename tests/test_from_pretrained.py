"""from_pretrained / save_pretrained round-trip — the reference's primary
pipeline verb on our artifact layout."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.models import pixart, vae as vae_lib
from tdm_tpu.pipelines import from_pretrained, save_pretrained


def test_pixart_pipeline_roundtrip(tmp_path):
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask)[
        "params"
    ]
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    dec = vae_lib.TAESDDecoder(cfg=vcfg)
    vparams = dec.init(jax.random.PRNGKey(1), lat)["params"]

    d = str(tmp_path / "pipe")
    save_pretrained(
        d, family="pixart",
        transformer_params=params,
        model_config={
            "sample_size": cfg.sample_size, "num_layers": cfg.num_layers,
            "num_heads": cfg.num_heads, "head_dim": cfg.head_dim,
            "caption_dim": cfg.caption_dim, "dtype": "float32",
            "attn_impl": "xla",
        },
        vae_params=vparams,
        vae_config={"width": 8, "num_stages": 1, "blocks_per_stage": 1},
    )
    pipe = from_pretrained(d)
    emb = (jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)), mask)
    out = pipe(prompt_embeds=emb, num_inference_steps=4, height=128, width=128,
               seed=42)
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out.images)).all()
    # same params through the direct constructor give identical images
    from tdm_tpu.pipelines import PixArtPipeline

    direct = PixArtPipeline(
        pixart.PixArtTransformer2D(cfg=cfg), params,
        vae_decoder=dec, vae_params=vparams,
    )
    out2 = direct(prompt_embeds=emb, num_inference_steps=4, height=128,
                  width=128, seed=42)
    np.testing.assert_allclose(
        np.asarray(out.images), np.asarray(out2.images), atol=1e-6
    )
