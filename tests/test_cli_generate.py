"""cli/generate: the README inference recipes (§3.4) end-to-end — pipeline
dir (or repo id) + embedding cache + LoRA → PNG / GIF artifacts on disk."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.cli import generate
from tdm_tpu.data.prompts import EmbeddingCache
from tdm_tpu.models import pixart, vae as vae_lib
from tdm_tpu.pipelines import save_pretrained

PROMPTS = ["a cat on a mat", "a dog in fog"]


@pytest.fixture(scope="module")
def pixart_pipe_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe") / "pixart")
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
    save_pretrained(
        d, family="pixart", transformer_params=params,
        model_config={
            "sample_size": cfg.sample_size, "num_layers": cfg.num_layers,
            "num_heads": cfg.num_heads, "head_dim": cfg.head_dim,
            "caption_dim": cfg.caption_dim, "dtype": "float32",
            "attn_impl": "xla",
        },
        vae_params=vparams,
        vae_config={"width": 8, "num_stages": 1, "blocks_per_stage": 1},
    )
    return d, cfg


@pytest.fixture(scope="module")
def cache_path(tmp_path_factory, pixart_pipe_dir):
    _, cfg = pixart_pipe_dir
    rng = np.random.default_rng(7)
    cache = EmbeddingCache(
        embeds=rng.normal(size=(2, 8, cfg.caption_dim)).astype(np.float16),
        masks=np.ones((2, 8), np.int64),
        prompts=list(PROMPTS),
        uncond_embed=np.zeros((8, cfg.caption_dim), np.float16),
        uncond_mask=np.ones(8, np.int64),
    )
    p = str(tmp_path_factory.mktemp("cache") / "embeds.npz")
    cache.save(p)
    return p


def test_generate_single_png(pixart_pipe_dir, cache_path, tmp_path):
    d, _ = pixart_pipe_dir
    out = str(tmp_path / "cat.png")
    generate.main([
        "--model", d, "--prompt", PROMPTS[0],
        "--embedding_cache", cache_path,
        "--num_inference_steps", "2", "--seed", "42",
        "--height", "128", "--width", "128",
        "--output", out,
    ])
    from PIL import Image

    img = Image.open(out)
    assert img.size == (32, 32)  # 128px request / 8 latent / ×2 tiny TAESD


def test_generate_tp(pixart_pipe_dir, cache_path, tmp_path):
    """--tp N: tensor-parallel serving through the CLI — the pixel output
    must match the single-device run (same seed, same sampler)."""
    d, _ = pixart_pipe_dir
    ref, out = str(tmp_path / "ref.png"), str(tmp_path / "tp.png")
    base = [
        "--model", d, "--prompt", PROMPTS[0],
        "--embedding_cache", cache_path,
        "--num_inference_steps", "2", "--seed", "42",
        "--height", "128", "--width", "128",
    ]
    generate.main(base + ["--output", ref])
    generate.main(base + ["--tp", "2", "--output", out])
    import numpy as np
    from PIL import Image

    a = np.asarray(Image.open(ref), np.int16)
    b = np.asarray(Image.open(out), np.int16)
    assert np.abs(a - b).max() <= 2  # bf16 1-ULP through the 8-bit encode

    with pytest.raises(SystemExit, match="local devices"):
        generate.main(base + ["--tp", "9", "--output", out])
    # a tp degree that divides no projection dim would silently replicate
    # everything — fail loudly instead (tiny model: hidden 32, ff 128)
    with pytest.raises(SystemExit, match="shards nothing"):
        generate.main(base + ["--tp", "3", "--output", out])


def test_generate_batch_to_dir_with_cfg(pixart_pipe_dir, cache_path, tmp_path):
    d, _ = pixart_pipe_dir
    out = str(tmp_path / "grid")
    generate.main([
        "--model", d, "--prompt", PROMPTS[0], PROMPTS[1],
        "--negative_prompt", PROMPTS[1], PROMPTS[0],
        "--guidance_scale", "4.5",
        "--embedding_cache", cache_path,
        "--num_inference_steps", "2", "--seed", "317",
        "--height", "128", "--width", "128",
        "--output", out,
    ])
    assert sorted(os.listdir(out)) == ["000.png", "001.png"]


def test_generate_num_images_per_prompt(pixart_pipe_dir, cache_path, tmp_path):
    """--num_images_per_prompt N → N files per prompt, prompt-major order
    (reference README.md:103)."""
    d, _ = pixart_pipe_dir
    out = str(tmp_path / "multi")
    generate.main([
        "--model", d, "--prompt", PROMPTS[0],
        "--embedding_cache", cache_path,
        "--num_inference_steps", "2", "--seed", "8888",
        "--num_images_per_prompt", "3",
        "--height", "128", "--width", "128",
        "--output", out,
    ])
    # file-count/order is the CLI contract here; per-image pixel variety
    # is pinned in tests/test_pipelines.py::test_num_images_per_prompt
    assert sorted(os.listdir(out)) == ["000.png", "001.png", "002.png"]


def test_generate_with_lora_scale(pixart_pipe_dir, cache_path, tmp_path):
    """--lora + --lora_scale: the released-checkpoint recipe verbs
    (README.md:49-50). Scale 0 must reproduce the base output exactly."""
    from tdm_tpu import lora as lora_lib
    from tdm_tpu.io import params as params_io

    d, _ = pixart_pipe_dir
    base = params_io.load_params(os.path.join(d, "transformer.safetensors"))
    adapter = lora_lib.init_lora(base, jax.random.PRNGKey(5), rank=2)
    # non-degenerate up factors so scale actually changes the output
    adapter = lora_lib.LoRA(
        params=jax.tree.map(
            lambda x: jax.random.normal(jax.random.PRNGKey(6), x.shape) * 0.1,
            adapter.params,
        ),
        alpha=adapter.alpha,
    )
    lora_file = str(tmp_path / "tdm_lora.safetensors")
    lora_lib.save_kohya(adapter, lora_file, prefix="lora_transformer")

    def run(out, extra):
        generate.main([
            "--model", d, "--prompt", PROMPTS[0],
            "--embedding_cache", cache_path,
            "--num_inference_steps", "2", "--seed", "42",
            "--height", "128", "--width", "128",
            "--output", out, *extra,
        ])
        from PIL import Image

        return np.asarray(Image.open(out))

    plain = run(str(tmp_path / "a.png"), [])
    zero = run(
        str(tmp_path / "b.png"),
        ["--lora", lora_file, "--lora_scale", "0.0"],
    )
    scaled = run(
        str(tmp_path / "c.png"),
        ["--lora", lora_file, "--lora_scale", "1.0"],
    )
    np.testing.assert_array_equal(plain, zero)
    assert (plain != scaled).any()


def test_generate_missing_prompt_in_cache_errors(
    pixart_pipe_dir, cache_path, tmp_path
):
    d, _ = pixart_pipe_dir
    with pytest.raises(SystemExit, match="not in the embedding cache"):
        generate.main([
            "--model", d, "--prompt", "unseen prompt",
            "--embedding_cache", cache_path,
            "--output", str(tmp_path / "x.png"),
        ])


def test_generate_no_encoders_no_cache_errors(pixart_pipe_dir, tmp_path):
    d, _ = pixart_pipe_dir
    with pytest.raises(SystemExit, match="no text encoders"):
        generate.main([
            "--model", d, "--prompt", PROMPTS[0],
            "--output", str(tmp_path / "x.png"),
        ])


def test_generate_cogvideox_gif(tmp_path):
    """Video path: tiny CogVideoX + 3D-VAE decoder → animated GIF (the
    export_to_video fps=8 recipe, README.md:135)."""
    from tdm_tpu.models import cogvideox as cog, vae3d

    cfg = cog.CogVideoXConfig.tiny()
    vcfg = vae3d.VAE3DConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    lat = jnp.zeros(
        (1, cfg.in_channels, cfg.sample_frames, cfg.sample_h, cfg.sample_w)
    )
    text = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)[
        "params"
    ]
    dec = vae3d.VAE3DDecoder(cfg=vcfg)
    vparams = dec.init(jax.random.PRNGKey(1), lat)["params"]
    d = str(tmp_path / "cogpipe")
    import dataclasses

    save_pretrained(
        d, family="cogvideox", transformer_params=params,
        model_config={
            k: getattr(cfg, k)
            for k in (
                "num_layers", "num_heads", "head_dim", "text_dim",
                "time_embed_dim", "max_text_len", "sample_frames",
                "sample_h", "sample_w",
            )
        } | {"dtype": "float32", "attn_impl": "xla"},
        vae_params=vparams,
        vae_config={
            f.name: getattr(vcfg, f.name)
            for f in dataclasses.fields(vcfg)
            if f.name != "dtype"
        },
    )
    cache = EmbeddingCache(
        embeds=np.random.default_rng(2).normal(
            size=(1, cfg.max_text_len, cfg.text_dim)
        ).astype(np.float16),
        masks=np.ones((1, cfg.max_text_len), np.int64),
        prompts=[PROMPTS[0]],
    )
    cache_p = str(tmp_path / "vid_cache.npz")
    cache.save(cache_p)

    num_frames = 1 + (cfg.sample_frames - 1) * vcfg.temporal_factor
    out = str(tmp_path / "video.gif")
    generate.main([
        "--model", d, "--prompt", PROMPTS[0],
        "--embedding_cache", cache_p,
        "--num_inference_steps", "2", "--seed", "8888",
        "--num_frames", str(num_frames),
        "--height", str(cfg.sample_h * vcfg.spatial_factor),
        "--width", str(cfg.sample_w * vcfg.spatial_factor),
        "--fps", "8", "--output", out,
    ])
    from PIL import Image

    gif = Image.open(out)
    assert gif.is_animated and gif.n_frames == num_frames


def test_generate_cfg_without_negative_uses_cache_uncond(
    pixart_pipe_dir, cache_path, tmp_path
):
    """guidance_scale > 1 with NO --negative_prompt must fall back to the
    cache's empty-prompt uncond embedding (the reference precomputes it,
    src/main.py:416-431) instead of crashing on encode_prompt(None) —
    and CFG must actually change the output vs guidance 1."""
    d, _ = pixart_pipe_dir

    def run(out, cfg_scale):
        generate.main([
            "--model", d, "--prompt", PROMPTS[0],
            "--guidance_scale", cfg_scale,
            "--embedding_cache", cache_path,
            "--num_inference_steps", "2", "--seed", "42",
            "--height", "128", "--width", "128",
            "--output", out, "--output_type", "latent",
        ])
        return np.load(out + ".npy")

    base = run(str(tmp_path / "g1"), "1.0")
    cfg = run(str(tmp_path / "g45"), "4.5")
    assert base.shape == cfg.shape
    assert not np.allclose(base, cfg), "CFG had no effect"
