"""Pipeline prompt-encoding paths: SD3's triple-encoder stack (CLIP-L +
CLIP-G penultimate hidden + pooled projections + T5 sequence) and SD1.5's
CLIP-L — assembled from tiny encoders end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.models import clip as clip_mod, mmdit_sd3, t5 as t5_mod, unet_sd15
from tdm_tpu.pipelines import SD3Pipeline, SD15Pipeline


class FakeTokenizer:
    def __init__(self, vocab=90, eos=95):
        self.vocab, self.eos = vocab, eos

    def __call__(self, texts, max_length):
        import zlib

        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [
                zlib.crc32(w.encode()) % self.vocab for w in t.split()
            ][: max_length - 1]
            ids[i, : len(toks)] = toks
            ids[i, len(toks)] = self.eos
            mask[i, : len(toks) + 1] = 1
        return ids, mask


def _clip(hidden, proj, seed):
    cfg = clip_mod.CLIPTextConfig(
        vocab_size=96, hidden=hidden, num_heads=2, num_layers=2,
        max_positions=16, eos_token_id=95, projection_dim=proj,
        dtype=jnp.float32, attn_impl="xla",
    )
    model = clip_mod.CLIPTextEncoder(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 16), jnp.int32)
    )["params"]
    return model, params, cfg


def _tiny_sd3_pipeline() -> SD3Pipeline:
    """Tiny SD3 pipeline with all three text encoders attached — shared by
    the encode_prompt tests here and the pooled-cache training e2e
    (`test_cli_train.py`). context_dim 48 = clip_l(16)+clip_g(24) padded +
    t5(48); pooled 16+8 = 24 = MMDiTConfig.tiny().pooled_dim."""
    mcfg = mmdit_sd3.MMDiTConfig.tiny()  # context_dim 48, pooled_dim 24
    clip_l, pl_, _ = _clip(16, 16, 0)
    clip_g, pg, _ = _clip(24, 8, 1)
    t5cfg = t5_mod.T5Config(
        vocab_size=128, d_model=48, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, dtype=jnp.float32, attn_impl="xla",
    )
    t5 = t5_mod.T5Encoder(cfg=t5cfg)
    pt5 = t5.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]

    model = mmdit_sd3.SD3Transformer2D(cfg=mcfg)
    lat = jnp.zeros((2, 16, 8, 8))
    params = model.init(
        jax.random.PRNGKey(3), lat, jnp.zeros((2,)),
        jnp.zeros((2, 6, mcfg.context_dim)), jnp.zeros((2, mcfg.pooled_dim)),
    )["params"]
    return SD3Pipeline(
        model, params,
        text_encoders={
            "clip_l": (clip_l, pl_), "clip_g": (clip_g, pg), "t5": (t5, pt5)
        },
        tokenizers={
            "clip_l": FakeTokenizer(), "clip_g": FakeTokenizer(),
            "t5": FakeTokenizer(vocab=120),
        },
        max_t5_len=8,
        max_clip_len=16,
    )


def test_sd3_triple_encoder_prompt():
    mcfg = mmdit_sd3.MMDiTConfig.tiny()  # context_dim 48, pooled_dim 24
    pipe = _tiny_sd3_pipeline()
    ctx, pooled = pipe.encode_prompt(["a cat", "a dog"])
    # 16-token CLIP seq + 8 T5 tokens
    assert ctx.shape == (2, 16 + 8, mcfg.context_dim)
    assert pooled.shape == (2, mcfg.pooled_dim)
    assert np.isfinite(np.asarray(ctx)).all()
    # different prompts → different embeddings
    ctx2, pooled2 = pipe.encode_prompt(["a cat", "a cat"])
    assert not np.allclose(np.asarray(pooled)[1], np.asarray(pooled2)[1])

    # full call through the encoders
    out = pipe(["a cat", "a dog"], num_inference_steps=4, height=64,
               width=64, seed=1, output_type="latent")
    assert out.latents.shape == (2, 16, 8, 8)


def test_sd15_clip_prompt():
    clip_l, params_c, ccfg = _clip(32, None, 0)
    ucfg = unet_sd15.UNetConfig.tiny()  # context_dim 32 == clip hidden
    model = unet_sd15.UNet2DCondition(cfg=ucfg)
    lat = jnp.zeros((1, 4, 16, 16))
    ctx0 = jnp.zeros((1, 6, ucfg.context_dim))
    params = model.init(
        jax.random.PRNGKey(1), lat, jnp.zeros((1,)), ctx0,
        jnp.ones((1, 6), jnp.int32),
    )["params"]
    pipe = SD15Pipeline(
        model, params, text_encoder=clip_l, text_encoder_params=params_c,
        tokenizer=FakeTokenizer(), max_text_len=16,
    )
    emb, mask = pipe.encode_prompt(["a dog"])
    assert emb.shape == (1, 16, 32)
    out = pipe(["a dog"], num_inference_steps=4, height=128, width=128,
               seed=317, output_type="latent")
    assert out.latents.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(out.latents, np.float32)).all()
