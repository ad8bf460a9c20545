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
