"""from_pretrained — the reference's primary pipeline verb, on all three
sources: our save_pretrained layout, a stock diffusers checkpoint directory
(model_index.json + subfolders, converted on the fly), and an `org/name`
repo id resolved through the local HF hub cache."""

import json
import os

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


# ---------------------------------------------------------------------------
# diffusers checkpoint layout
# ---------------------------------------------------------------------------


def _write_diffusers_pixart(root) -> pixart.PixArtConfig:
    """Synthetic PixArt diffusers checkout: model_index + transformer/ (HF
    config + torch-layout safetensors) + AutoencoderTiny vae/."""
    from safetensors.numpy import save_file

    from tests.test_convert import synthetic_pixart_sd, synthetic_taesd_sd

    cfg = pixart.PixArtConfig.tiny()
    os.makedirs(os.path.join(root, "transformer"))
    os.makedirs(os.path.join(root, "vae"))
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"_class_name": "PixArtAlphaPipeline"}, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({
            "_class_name": "PixArtTransformer2DModel",
            "sample_size": cfg.sample_size, "patch_size": cfg.patch_size,
            "in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
            "num_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.head_dim,
            "caption_channels": cfg.caption_dim,
        }, f)
    save_file(
        synthetic_pixart_sd(cfg),
        os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"),
    )
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({
            "_class_name": "AutoencoderTiny",
            "latent_channels": vcfg.latent_channels, "scaling_factor": 1.0,
            "decoder_block_out_channels": [8, 8],
            "num_decoder_blocks": [1, 1],
        }, f)
    save_file(
        synthetic_taesd_sd(vcfg),
        os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"),
    )
    return cfg


def test_from_diffusers_checkpoint_dir(tmp_path):
    root = str(tmp_path / "hf_ckpt")
    os.makedirs(root)
    cfg = _write_diffusers_pixart(root)
    pipe = from_pretrained(
        root, model_config={"dtype": "float32", "attn_impl": "xla"}
    )
    from tdm_tpu.pipelines import PixArtPipeline

    assert isinstance(pipe, PixArtPipeline)
    mc = pipe.transformer.cfg
    assert (mc.num_layers, mc.num_heads, mc.head_dim, mc.caption_dim) == (
        cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.caption_dim,
    )
    emb = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)),
        jnp.ones((1, 8), jnp.int32),
    )
    out = pipe(
        prompt_embeds=emb, num_inference_steps=4, height=128, width=128,
        seed=42,
    )
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out.images)).all()

    # identical to converting by hand and using the direct constructor
    from tdm_tpu.io import convert

    sd = convert.load_torch_state_dict(os.path.join(root, "transformer"))
    params = convert.to_jax(convert.pixart_params(sd))
    vsd = convert.load_torch_state_dict(os.path.join(root, "vae"))
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    vparams = convert.to_jax(
        convert.taesd_params(vsd, num_stages=1, blocks_per_stage=1)["decoder"]
    )
    direct = PixArtPipeline(
        pixart.PixArtTransformer2D(cfg=cfg), params,
        vae_decoder=vae_lib.TAESDDecoder(cfg=vcfg), vae_params=vparams,
    )
    out2 = direct(
        prompt_embeds=emb, num_inference_steps=4, height=128, width=128,
        seed=42,
    )
    np.testing.assert_allclose(
        np.asarray(out.images), np.asarray(out2.images), atol=1e-6
    )


def test_from_diffusers_sd3_checkpoint(tmp_path):
    from safetensors.numpy import save_file

    from tdm_tpu.models import mmdit_sd3
    from tests.test_convert_models import _build_sd3_dict

    cfg = mmdit_sd3.MMDiTConfig.tiny()
    root = str(tmp_path / "sd3_ckpt")
    os.makedirs(os.path.join(root, "transformer"))
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"_class_name": "StableDiffusion3Pipeline"}, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({
            "_class_name": "SD3Transformer2DModel",
            "sample_size": cfg.sample_size, "patch_size": cfg.patch_size,
            "in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
            "num_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.head_dim,
            "joint_attention_dim": cfg.context_dim,
            "pooled_projection_dim": cfg.pooled_dim,
            "pos_embed_max_size": cfg.pos_embed_max_size,
        }, f)
    save_file(
        _build_sd3_dict(cfg),
        os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"),
    )
    pipe = from_pretrained(
        root, model_config={"dtype": "float32", "attn_impl": "xla"}
    )
    from tdm_tpu.pipelines import SD3Pipeline

    assert isinstance(pipe, SD3Pipeline)
    embeds = (
        jax.random.normal(jax.random.PRNGKey(0), (1, 6, cfg.context_dim)),
        jax.random.normal(jax.random.PRNGKey(1), (1, cfg.pooled_dim)),
    )
    out = pipe(
        prompt_embeds=embeds, num_inference_steps=4, height=64, width=64,
        seed=8888, output_type="latent",
    )
    assert np.isfinite(np.asarray(out.latents)).all()


def test_from_pretrained_repo_id_via_hub_cache(tmp_path, monkeypatch):
    """`from_pretrained("org/name")` resolves through the HF hub cache."""
    cache = tmp_path / "hub"
    commit = "c" * 40
    repo = cache / "models--tdm--pixart-tiny"
    snap = repo / "snapshots" / commit
    os.makedirs(snap)
    _write_diffusers_pixart(str(snap))
    os.makedirs(repo / "refs")
    (repo / "refs" / "main").write_text(commit)
    monkeypatch.setenv("HF_HUB_CACHE", str(cache))

    cfg = pixart.PixArtConfig.tiny()
    pipe = from_pretrained(
        "tdm/pixart-tiny",
        model_config={"dtype": "float32", "attn_impl": "xla"},
    )
    emb = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)),
        jnp.ones((1, 8), jnp.int32),
    )
    out = pipe(
        prompt_embeds=emb, num_inference_steps=2, height=128, width=128,
        seed=1,
    )
    assert out.images.shape == (1, 32, 32, 3)


def test_bundled_text_encoder_roundtrip(tmp_path):
    """Layout-1 pipelines can bundle a single text encoder: the saved
    text_encoder.safetensors + pipeline.json 'text_encoder' block rebuild
    the encoder+tokenizer, so `pipe(["a cat"])` works without prompt_embeds
    (the reference always loads encoders, src/main.py:160-165)."""
    import dataclasses

    from tdm_tpu.models import t5

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask
    )["params"]

    tcfg = t5.T5Config.tiny()
    assert tcfg.d_model == cfg.caption_dim
    enc = t5.T5Encoder(cfg=tcfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    eparams = enc.init(jax.random.PRNGKey(1), ids, mask)["params"]

    d = str(tmp_path / "pipe_with_encoder")
    save_pretrained(
        d, family="pixart", transformer_params=params,
        model_config={
            "sample_size": cfg.sample_size, "num_layers": cfg.num_layers,
            "num_heads": cfg.num_heads, "head_dim": cfg.head_dim,
            "caption_dim": cfg.caption_dim, "dtype": "float32",
            "attn_impl": "xla",
        },
        text_encoder_params=eparams,
        text_encoder_config={
            "family": "t5",
            "config": {
                f.name: getattr(tcfg, f.name)
                for f in dataclasses.fields(tcfg) if f.name != "dtype"
            } | {"dtype": "float32"},
            "tokenizer": {"kind": "hash", "vocab_size": tcfg.vocab_size},
        },
    )
    pipe = from_pretrained(d)
    assert pipe.text_encoder is not None and pipe.tokenizer is not None
    emb, m = pipe.encode_prompt(["a cat on a mat"])
    assert emb.shape[-1] == cfg.caption_dim

    out = pipe(
        ["a cat on a mat"], num_inference_steps=2, height=128, width=128,
        seed=3, output_type="latent",
    )
    assert np.isfinite(np.asarray(out.latents)).all()


def test_from_diffusers_attaches_t5_encoder(tmp_path):
    """A PixArt diffusers checkout's text_encoder/ subfolder (transformers
    T5EncoderModel) attaches on from_pretrained, numerically matching the
    torch model it was converted from."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    root = str(tmp_path / "hf_ckpt")
    os.makedirs(root)
    cfg = _write_diffusers_pixart(root)

    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=cfg.caption_dim, d_kv=8, num_heads=4,
        d_ff=64, num_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    enc_dir = os.path.join(root, "text_encoder")
    os.makedirs(enc_dir)
    with open(os.path.join(enc_dir, "config.json"), "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    save_file(
        {k: v.detach().numpy().copy() for k, v in hf.state_dict().items()},
        os.path.join(enc_dir, "model.safetensors"),
    )

    pipe = from_pretrained(
        root, model_config={"dtype": "float32", "attn_impl": "xla"}
    )
    assert pipe.text_encoder is not None
    ids = np.random.default_rng(0).integers(0, 128, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = pipe.text_encoder.apply(
        {"params": pipe.text_encoder_params},
        jnp.asarray(ids), jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)

    # encoder + hash tokenizer end-to-end: prompt -> image without embeds
    from tdm_tpu.data.tokenizer import HashTokenizer

    pipe.tokenizer = HashTokenizer(vocab_size=128)
    out = pipe(
        ["a cat on a mat"], num_inference_steps=2, height=128, width=128,
        seed=5,
    )
    assert out.images.shape == (1, 32, 32, 3)


def test_from_diffusers_sd3_triple_encoder(tmp_path):
    """An SD3 checkout's text_encoder/_2/_3 subfolders (CLIP-L, CLIP-G,
    T5) attach as the triple-encoder stack; encode_prompt produces the
    (context, pooled) pair with the penultimate-layer + pad-to-4096-analog
    layout, and the full 4-NFE call runs from raw prompts."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    from tdm_tpu.models import mmdit_sd3
    from tests.test_convert_models import _build_sd3_dict

    cfg = mmdit_sd3.MMDiTConfig.tiny()  # context_dim 48, pooled_dim 24
    root = str(tmp_path / "sd3_ckpt")
    os.makedirs(os.path.join(root, "transformer"))
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"_class_name": "StableDiffusion3Pipeline"}, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump({
            "sample_size": cfg.sample_size, "patch_size": cfg.patch_size,
            "in_channels": cfg.in_channels, "out_channels": cfg.out_channels,
            "num_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.head_dim,
            "joint_attention_dim": cfg.context_dim,
            "pooled_projection_dim": cfg.pooled_dim,
            "pos_embed_max_size": cfg.pos_embed_max_size,
        }, f)
    save_file(
        _build_sd3_dict(cfg),
        os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"),
    )

    torch.manual_seed(1)
    for i, sub in enumerate(("text_encoder", "text_encoder_2")):
        ccfg = transformers.CLIPTextConfig(
            vocab_size=96, hidden_size=16, num_attention_heads=4,
            num_hidden_layers=2, intermediate_size=32,
            max_position_embeddings=16, eos_token_id=95, bos_token_id=94,
            hidden_act="quick_gelu" if i == 0 else "gelu",
            attention_dropout=0.0, projection_dim=cfg.pooled_dim // 2,
        )
        chf = transformers.CLIPTextModelWithProjection(ccfg).eval()
        d = os.path.join(root, sub)
        os.makedirs(d)
        conf = ccfg.to_dict()
        conf["architectures"] = ["CLIPTextModelWithProjection"]
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(conf, f)
        save_file(
            {k: v.detach().numpy().copy() for k, v in chf.state_dict().items()},
            os.path.join(d, "model.safetensors"),
        )
    t5_cfg = transformers.T5Config(
        vocab_size=128, d_model=cfg.context_dim, d_kv=8, num_heads=4,
        d_ff=64, num_layers=2, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False,
    )
    t5_hf = transformers.T5EncoderModel(t5_cfg).eval()
    d = os.path.join(root, "text_encoder_3")
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(t5_cfg.to_dict(), f)
    save_file(
        {k: v.detach().numpy().copy() for k, v in t5_hf.state_dict().items()},
        os.path.join(d, "model.safetensors"),
    )

    pipe = from_pretrained(
        root, model_config={"dtype": "float32", "attn_impl": "xla"},
        max_clip_len=16, max_t5_len=8,
    )
    assert set(pipe.text_encoders) == {"clip_l", "clip_g", "t5"}

    from tdm_tpu.data.tokenizer import HashTokenizer

    pipe.tokenizers = {
        "clip_l": HashTokenizer(vocab_size=96, eos_id=95),
        "clip_g": HashTokenizer(vocab_size=96, eos_id=95),
        "t5": HashTokenizer(vocab_size=128),
    }
    ctx, pooled = pipe.encode_prompt(["a cat on a mat"])
    assert ctx.shape == (1, 16 + 8, cfg.context_dim)
    assert pooled.shape == (1, cfg.pooled_dim)
    assert np.isfinite(np.asarray(ctx)).all()

    out = pipe(
        ["a cat on a mat"], num_inference_steps=2, height=64, width=64,
        seed=8888, output_type="latent",
    )
    assert np.isfinite(np.asarray(out.latents)).all()


def test_pipe_save_pretrained_method_roundtrip(tmp_path):
    """pipe.save_pretrained(dir) (the diffusers instance verb) →
    from_pretrained(dir) reproduces the pipeline: same config, identical
    images for the same inputs."""
    from tdm_tpu.pipelines import PixArtPipeline

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask
    )["params"]
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    dec = vae_lib.TAESDDecoder(cfg=vcfg)
    vparams = dec.init(jax.random.PRNGKey(1), lat)["params"]
    pipe = PixArtPipeline(
        model, params, vae_decoder=dec, vae_params=vparams,
    )
    d = str(tmp_path / "saved")
    pipe.save_pretrained(d)
    re = from_pretrained(d)
    assert re.transformer.cfg == cfg
    assert re.vae_decoder.cfg == vcfg
    emb = (
        jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.caption_dim)),
        mask,
    )
    kw = dict(
        prompt_embeds=emb, num_inference_steps=2, height=128, width=128,
        seed=7,
    )
    np.testing.assert_array_equal(
        np.asarray(pipe(**kw).images), np.asarray(re(**kw).images)
    )


def test_pipe_save_pretrained_bundles_text_encoder(tmp_path):
    """pipe.save_pretrained on a pipeline with a T5 encoder + hash
    tokenizer attached round-trips PROMPTS: the reloaded pipeline encodes
    text itself and reproduces the original's images."""
    from tdm_tpu.data.tokenizer import HashTokenizer
    from tdm_tpu.models import t5 as t5_mod
    from tdm_tpu.pipelines import PixArtPipeline

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask
    )["params"]
    tcfg = t5_mod.T5Config.tiny()
    enc = t5_mod.T5Encoder(cfg=tcfg)
    tparams = enc.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32), mask
    )["params"]
    pipe = PixArtPipeline(
        model, params,
        text_encoder=enc, text_encoder_params=tparams,
        tokenizer=HashTokenizer(vocab_size=120),
        # default max_text_len on purpose: the reloaded pipeline uses the
        # family default, and the parity check needs both to agree
    )
    d = str(tmp_path / "saved_enc")
    pipe.save_pretrained(d)
    re = from_pretrained(d)
    assert re.text_encoder is not None and re.tokenizer is not None
    kw = dict(
        num_inference_steps=2, height=128, width=128, seed=7,
        output_type="latent",
    )
    np.testing.assert_array_equal(
        np.asarray(pipe(["a cat"], **kw).latents, np.float32),
        np.asarray(re(["a cat"], **kw).latents, np.float32),
    )
