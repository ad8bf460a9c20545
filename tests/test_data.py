"""Data pipeline tests: prompt loading, host sharding, determinism,
embedding cache roundtrip, validation grid imaging."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.data.prompts import EmbeddingCache, PromptBatcher, load_prompts
from tdm_tpu.data.tokenizer import HashTokenizer


def test_load_prompts_txt_and_jsonl(tmp_path):
    txt = tmp_path / "p.txt"
    txt.write_text("a cat\na dog\n\na panda\n")
    assert load_prompts(str(txt)) == ["a cat", "a dog", "a panda"]

    jl = tmp_path / "p.jsonl"
    jl.write_text('{"prompt": "x"}\n{"prompt": "y", "other": 1}\n')
    assert load_prompts(str(jl)) == ["x", "y"]
    assert load_prompts(["a", "b"], max_samples=1) == ["a"]


def test_batcher_sharding_and_determinism():
    prompts = [f"prompt {i}" for i in range(16)]
    tok = HashTokenizer(vocab_size=100)

    def take(host, n=3):
        it = iter(
            PromptBatcher(
                prompts, 4, tokenizer=tok, max_length=8, seed=7,
                host_index=host, host_count=2,
            )
        )
        return [next(it) for _ in range(n)]

    a1, a2 = take(0), take(0)
    for x, y in zip(a1, a2):
        assert x["prompts"] == y["prompts"]
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])
    # host shards are disjoint
    b = take(1)
    seen0 = {p for batch in a1 for p in batch["prompts"]}
    seen1 = {p for batch in b for p in batch["prompts"]}
    assert seen0.isdisjoint(seen1)
    # hash tokenizer is stable and mask marks real tokens + eos
    ids, mask = tok(["hello world"], max_length=8)
    ids2, _ = tok(["hello world"], max_length=8)
    np.testing.assert_array_equal(ids, ids2)
    assert mask[0].sum() == 3  # 2 words + eos


def test_embedding_cache_roundtrip(tmp_path):
    prompts = [f"p{i}" for i in range(10)]
    tok = HashTokenizer(vocab_size=50)
    table = np.random.default_rng(0).normal(size=(50, 16)).astype(np.float32)

    def encode(ids, mask):
        return table[ids] * mask[..., None]

    cache = EmbeddingCache.build(
        prompts, tok, encode, max_length=8, batch_size=4
    )
    assert cache.embeds.shape == (10, 8, 16)
    f = str(tmp_path / "cache.npz")
    cache.save(f)
    back = EmbeddingCache.load(f)
    np.testing.assert_allclose(back.embeds, cache.embeds)
    assert back.prompts == prompts
    emb, mask = next(back.batches(4, seed=0))
    assert emb.shape == (4, 8, 16) and mask.shape == (4, 8)


def test_validation_grid_and_png(tmp_path):
    from tdm_tpu.core import schedules as sched
    from tdm_tpu.train import validation

    # analytic denoiser: point-mass at x0* ⇒ rollout recovers x0*
    x0_target = jnp.full((2, 3, 8, 8), 0.25)
    schedule = sched.ddpm_linear()

    def denoise_fn(params, x, t, cond):
        a, s = sched.alpha_sigma(schedule, t, x.ndim)
        return (x - a * x0_target) / jnp.maximum(s, 1e-4)

    noise = jax.random.normal(jax.random.PRNGKey(0), x0_target.shape)
    grids = validation.save_validation_images(
        denoise_fn, None, schedule, None, noise,
        decode_fn=lambda z: z,  # identity "decode"
        output_dir=str(tmp_path), step=50,
    )
    assert set(grids) == {4, 1}
    assert os.path.exists(tmp_path / "validation_step50_4nfe.png")
    assert os.path.exists(tmp_path / "validation_step50_1nfe.png")
    # rollout recovered the target (grid ≈ 0.25 → uint8 ≈ 64)
    assert abs(int(grids[4].mean()) - 64) <= 2


def test_log_validation_compare_grids(tmp_path):
    """Student-vs-teacher comparison grids (`log_validation`,
    reference src/training.py:64-83) write both PNGs deterministically."""
    import jax
    import jax.numpy as jnp

    from tdm_tpu.core import schedules as sched
    from tdm_tpu.train import validation

    schedule = sched.ddpm_linear()
    x0_s = jnp.full((2, 3, 8, 8), 0.3)
    x0_t = jnp.full((2, 3, 8, 8), 0.7)

    def denoise_fn(params, x, t, cond):
        target = x0_s if params == "student" else x0_t
        a, s = sched.alpha_sigma(schedule, t, x.ndim)
        return (x - a * target) / jnp.maximum(s, 1e-4)

    grids = validation.log_validation(
        denoise_fn, "student", "teacher", schedule,
        cond=jnp.ones((2, 1)), uncond=jnp.zeros((2, 1)),
        decode_fn=lambda z: z, output_dir=str(tmp_path), step=100,
        sample_shape=(3, 8, 8), teacher_steps=8, teacher_cfg=2.0,
    )
    assert set(grids) == {"student", "teacher"}
    assert os.path.exists(tmp_path / "compare_step100_student.png")
    assert os.path.exists(tmp_path / "compare_step100_teacher.png")
    # the two runs recover their respective targets
    assert abs(int(grids["student"].mean()) - int(0.3 * 255)) <= 3
    assert abs(int(grids["teacher"].mean()) - int(0.7 * 255)) <= 3


def test_save_video_gif(tmp_path):
    from tdm_tpu.train.validation import save_video_gif

    frames = np.linspace(0, 1, 6)[:, None, None, None] * np.ones((6, 8, 8, 3))
    p = str(tmp_path / "v.gif")
    save_video_gif(p, frames.astype(np.float32), fps=8)
    from PIL import Image

    im = Image.open(p)
    assert im.n_frames == 6


def test_cogvideox_encode_prompt():
    import jax
    import jax.numpy as jnp

    from tdm_tpu.data.tokenizer import HashTokenizer
    from tdm_tpu.models import cogvideox as cog, t5 as t5_mod
    from tdm_tpu.pipelines import CogVideoXPipeline

    ccfg = cog.CogVideoXConfig.tiny()
    tcfg = t5_mod.T5Config(
        vocab_size=128, d_model=ccfg.text_dim, d_kv=8, num_heads=4,
        d_ff=64, num_layers=2, dtype=jnp.float32, attn_impl="xla",
    )
    t5 = t5_mod.T5Encoder(cfg=tcfg)
    pt5 = t5.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, ccfg.max_text_len), jnp.int32),
        jnp.ones((1, ccfg.max_text_len), jnp.int32),
    )["params"]
    model = cog.CogVideoXTransformer3D(cfg=ccfg)
    lat = jnp.zeros((1, 16, ccfg.sample_frames, ccfg.sample_h, ccfg.sample_w))
    params = model.init(
        jax.random.PRNGKey(1), lat, jnp.zeros((1,)),
        jnp.zeros((1, ccfg.max_text_len, ccfg.text_dim)),
    )["params"]
    from tdm_tpu.models import vae3d

    vcfg = vae3d.VAE3DConfig.tiny()  # factors 2/2 match the dims below
    pipe = CogVideoXPipeline(
        model, params, text_encoder=t5, text_encoder_params=pt5,
        tokenizer=HashTokenizer(120), vae_cfg=vcfg,
    )
    emb = pipe.encode_prompt(["a panda riding a bike"])
    assert emb.shape == (1, ccfg.max_text_len, ccfg.text_dim)
    out = pipe(
        ["a panda riding a bike"], num_inference_steps=4,
        num_frames=1 + (ccfg.sample_frames - 1) * vcfg.temporal_factor,
        height=ccfg.sample_h * vcfg.spatial_factor,
        width=ccfg.sample_w * vcfg.spatial_factor,
        seed=8888, output_type="latent",
    )
    assert out.latents.shape == lat.shape


def test_embedding_cache_validation_rows(tmp_path):
    """Dedicated validation rows (build_cache --validation_prompts):
    looked up by prompt, surviving save/load, falling back to main rows,
    erroring with a rebuild hint when absent — the fixed-prompt grid
    methodology of the reference (src/main.py:416-431)."""
    import pytest

    prompts = [f"p{i}" for i in range(6)]
    val_prompts = ["a photo of a cat", "p2"]  # p2 is ALSO a training row
    tok = HashTokenizer(vocab_size=50)
    table = np.random.default_rng(1).normal(size=(50, 16)).astype(np.float32)

    def encode(ids, mask):
        return table[ids] * mask[..., None]

    cache = EmbeddingCache.build(
        prompts, tok, encode, max_length=8, batch_size=4,
        val_prompts=["a photo of a cat"],
    )
    f = str(tmp_path / "cache.npz")
    cache.save(f)
    back = EmbeddingCache.load(f)
    assert back.val_prompts == ["a photo of a cat"]

    e, m, p = back.validation_rows(val_prompts)
    assert e.shape == (2, 8, 16) and m.shape == (2, 8) and p is None
    # the dedicated row matches a direct encode of the same prompt
    ids, mask = tok(["a photo of a cat"], max_length=8)
    np.testing.assert_allclose(
        e[0], encode(np.asarray(ids), np.asarray(mask))[0], rtol=1e-3
    )
    # the fallback row is the main-table row for p2
    np.testing.assert_allclose(e[1], back.embeds[2].astype(np.float32))

    with pytest.raises(KeyError, match="rebuild"):
        back.validation_rows(["never embedded"])


def test_load_prompts_dataset_config_name(monkeypatch):
    """--dataset_config_name reaches datasets.load_dataset (reference
    src/main.py:231-238)."""
    import sys
    import types

    calls = {}

    class _DS:
        column_names = ["prompt"]

        def __getitem__(self, k):
            return ["a", "b"]

    fake = types.ModuleType("datasets")

    def load_dataset(name, config=None, split=None):
        calls["args"] = (name, config, split)
        return _DS()

    fake.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake)
    out = load_prompts("org/some-dataset", dataset_config_name="cfgA")
    assert out == ["a", "b"]
    assert calls["args"] == ("org/some-dataset", "cfgA", "train")
