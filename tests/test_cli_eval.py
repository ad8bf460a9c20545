"""cli/evaluate: CLIP-score evaluation end-to-end on a tiny PixArt pipeline
and a tiny HF-layout CLIPModel checkpoint — student run, teacher compare,
JSON contract, saved grids."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tdm_tpu.cli import evaluate  # noqa: E402
from tdm_tpu.data.prompts import EmbeddingCache  # noqa: E402
from tdm_tpu.models import pixart, vae as vae_lib  # noqa: E402
from tdm_tpu.pipelines import save_pretrained  # noqa: E402

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


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    """Tiny HF CLIPModel checkpoint dir: config.json + safetensors +
    tokenizer files (the real CLIP vocab, so CLIPTokenizerFast loads)."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("clip")
    cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=49408, hidden_size=32, num_attention_heads=4,
            num_hidden_layers=2, intermediate_size=128,
            max_position_embeddings=16, hidden_act="quick_gelu",
        ),
        vision_config=dict(
            image_size=16, patch_size=4, hidden_size=32,
            num_attention_heads=4, num_hidden_layers=2,
            intermediate_size=128, hidden_act="quick_gelu",
        ),
        projection_dim=24,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(cfg).eval()
    with open(d / "config.json", "w") as f:
        json.dump(hf.config.to_dict(), f)
    save_file(
        {
            k: np.ascontiguousarray(v.detach().numpy())
            for k, v in hf.state_dict().items()
        },
        str(d / "model.safetensors"),
    )
    try:
        tok = transformers.CLIPTokenizerFast.from_pretrained(
            "openai/clip-vit-base-patch32"
        )
    except Exception:
        tok = None  # zero egress and no local cache → skip tokenizer
    if tok is not None:
        tok.save_pretrained(str(d))
    else:
        _write_minimal_clip_tokenizer(str(d))
    return str(d)


def _write_minimal_clip_tokenizer(d: str) -> None:
    """A from-scratch CLIP-style BPE vocab (slow tokenizer files) covering
    the test prompts — enough for CLIPTokenizer(Fast) to load offline."""
    words = sorted({w for p in PROMPTS for w in p.split()})
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for w in words:
        vocab.setdefault(w + "</w>", len(vocab))
        for ch in w:
            vocab.setdefault(ch, len(vocab))
            vocab.setdefault(ch + "</w>", len(vocab))
    merges = ["#version: 0.2"]
    # one merge per word so whole words tokenize compactly: not needed for
    # correctness (char fallback works), keep file minimal
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("\n".join(merges) + "\n")
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "CLIPTokenizer"}, f)
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump(
            {
                "bos_token": "<|startoftext|>",
                "eos_token": "<|endoftext|>",
                "pad_token": "<|endoftext|>",
                "unk_token": "<|endoftext|>",
            },
            f,
        )


def test_eval_cli_student_and_teacher(
    pixart_pipe_dir, cache_path, clip_dir, tmp_path, capsys
):
    d, _ = pixart_pipe_dir
    out_json = str(tmp_path / "eval.json")
    grids = str(tmp_path / "grids")
    evaluate.main([
        "--model", d, "--clip_model", clip_dir,
        "--prompt", *PROMPTS,
        "--embedding_cache", cache_path,
        "--num_inference_steps", "2", "--seed", "42",
        "--height", "128", "--width", "128",
        "--compare_teacher", "--teacher_steps", "4",
        "--teacher_guidance", "3.0",
        "--output", out_json, "--save_images", grids,
    ])
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    saved = json.loads(open(out_json).read())
    assert printed == saved
    assert len(saved["student"]["clip_scores"]) == len(PROMPTS)
    assert len(saved["teacher"]["clip_scores"]) == len(PROMPTS)
    for s in saved["student"]["clip_scores"] + saved["teacher"]["clip_scores"]:
        assert 0.0 <= s <= 100.0
    assert saved["teacher"]["steps"] == 4
    assert "student_minus_teacher" in saved
    for tag in ("student", "teacher"):
        for i in range(len(PROMPTS)):
            assert os.path.exists(os.path.join(grids, f"{tag}_{i:03d}.png"))
