"""CLIP vision tower + CLIP-score parity vs live torch (transformers), on
random-init tiny configs — same methodology as tests/test_text_encoders.py.

The reference has no automated quality metric (human-eval only,
`/root/reference/README.md:17-27`); eval/clip_score.py adds CLIPScore on
top of the in-repo CLIP towers, and these tests pin it to the torch
CLIPModel semantics end to end (preprocess excluded — that is pinned
separately against the known constants)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

import tdm_tpu.eval.clip_score as cs  # noqa: E402
from tdm_tpu.io import convert  # noqa: E402
from tdm_tpu.models import clip as clip_mod  # noqa: E402

TEXT_KW = dict(
    vocab_size=96, hidden_size=32, num_attention_heads=4, num_hidden_layers=2,
    intermediate_size=128, max_position_embeddings=16, eos_token_id=95,
    bos_token_id=94, hidden_act="quick_gelu",
)
VISION_KW = dict(
    image_size=16, patch_size=4, hidden_size=32, num_attention_heads=4,
    num_hidden_layers=2, intermediate_size=128, hidden_act="quick_gelu",
)


def _numpy_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def hf_clip():
    cfg = transformers.CLIPConfig(
        text_config=TEXT_KW, vision_config=VISION_KW, projection_dim=24
    )
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval()


def test_vision_tower_parity(hf_clip):
    sd = {
        k: v for k, v in _numpy_sd(hf_clip).items()
        if k.startswith("vision_model.") or k == "visual_projection.weight"
    }
    params = convert.to_jax(convert.clip_vision_params(sd))
    model = clip_mod.CLIPVisionEncoder(cfg=clip_mod.CLIPVisionConfig.tiny())

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = hf_clip.vision_model(pixel_values=torch.tensor(px))
        ref_last = ref.last_hidden_state.numpy()
        ref_proj = hf_clip.visual_projection(ref.pooler_output).numpy()
    ours = model.apply({"params": params}, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state), ref_last, atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.pooled), ref_proj, atol=2e-5, rtol=2e-5
    )


def test_clip_score_matches_torch(hf_clip):
    text_params, vision_params, logit_scale = convert.clip_model_params(
        _numpy_sd(hf_clip)
    )
    assert logit_scale > 0
    text_cfg = clip_mod.CLIPTextConfig(
        vocab_size=96, hidden=32, num_heads=4, num_layers=2, max_positions=16,
        eos_token_id=95, dtype=jnp.float32, attn_impl="xla", projection_dim=24,
    )
    vision_cfg = clip_mod.CLIPVisionConfig.tiny()
    scorer = cs.CLIPScorer(
        text_cfg, vision_cfg,
        convert.to_jax(text_params), convert.to_jax(vision_params),
    )

    rng = np.random.default_rng(1)
    imgs = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)  # [B,H,W,3]
    ids = rng.integers(0, 94, (3, 16))
    ids[:, -1] = 95  # eos

    # torch side: same preprocess (identity resize at 16px) + CLIPModel
    px = np.transpose(
        (imgs - np.asarray(cs.CLIP_MEAN)) / np.asarray(cs.CLIP_STD),
        (0, 3, 1, 2),
    )
    with torch.no_grad():
        img_emb = hf_clip.get_image_features(pixel_values=torch.tensor(px))
        txt_emb = hf_clip.get_text_features(input_ids=torch.tensor(ids))
        cos = torch.nn.functional.cosine_similarity(img_emb, txt_emb)
        ref_score = np.maximum(cos.numpy(), 0.0) * 100.0

    ours = scorer.score(jnp.asarray(imgs), input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(ours, ref_score, atol=2e-3)


def test_from_pretrained_roundtrip(hf_clip, tmp_path):
    """A saved HF CLIPModel directory loads through CLIPScorer.from_pretrained
    (config-derived tower configs + strict converters + safetensors)."""
    from safetensors.numpy import save_file

    d = tmp_path / "clip"
    os.makedirs(d)
    with open(d / "config.json", "w") as f:
        json.dump(hf_clip.config.to_dict(), f)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in _numpy_sd(hf_clip).items()},
        str(d / "model.safetensors"),
    )
    scorer = cs.CLIPScorer.from_pretrained(str(d))
    assert scorer.text_cfg.hidden == 32
    assert scorer.vision_cfg.patch_size == 4
    assert scorer.vision_cfg.projection_dim == 24

    rng = np.random.default_rng(2)
    imgs = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(0, 94, (2, 16))
    ids[:, -1] = 95
    out = scorer.score(jnp.asarray(imgs), input_ids=jnp.asarray(ids))
    assert out.shape == (2,)
    assert np.all(out >= 0) and np.all(out <= 100)


def test_preprocess_constants_and_resize():
    # a mid-gray image maps to (0.5 - mean)/std exactly; resize path keeps
    # values in range and emits the CLIP input layout
    img = jnp.full((1, 16, 16, 3), 0.5, jnp.float32)
    out = np.asarray(cs.preprocess_images(img, image_size=16))
    expect = (0.5 - np.asarray(cs.CLIP_MEAN)) / np.asarray(cs.CLIP_STD)
    np.testing.assert_allclose(out[0, :, 0, 0], expect, atol=1e-6)

    big = jnp.asarray(
        np.random.default_rng(3).uniform(size=(2, 40, 40, 3)), jnp.float32
    )
    out = np.asarray(cs.preprocess_images(big, image_size=16))
    assert out.shape == (2, 3, 16, 16)
    un = out * np.asarray(cs.CLIP_STD)[:, None, None] + np.asarray(
        cs.CLIP_MEAN
    )[:, None, None]
    assert un.min() >= -1e-5 and un.max() <= 1 + 1e-5


def test_legacy_eos2_pooling_matches_torch():
    """Stock OpenAI CLIP checkpoints carry the legacy eos_token_id=2 config;
    HF pools those at argmax(input_ids) (the EOT compat branch of
    transformers PR #24773). Our encoder must match — with the naive
    (ids == 2) rule every pooled vector lands on BOS and CLIP scores are
    prompt-insensitive noise."""
    from tdm_tpu.models import clip as clip_mod

    cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=128,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=2, bos_token_id=1,
    )
    torch.manual_seed(3)
    hf = transformers.CLIPTextModel(cfg).eval()
    sd = _numpy_sd(hf)
    params = convert.to_jax(convert.clip_text_params(sd))
    ours_cfg = clip_mod.CLIPTextConfig(
        vocab_size=96, hidden=32, num_heads=4, num_layers=2,
        max_positions=16, eos_token_id=2, dtype=jnp.float32, attn_impl="xla",
    )
    model = clip_mod.CLIPTextEncoder(cfg=ours_cfg)

    rng = np.random.default_rng(4)
    # EOT (id 95) mid-sequence, ids never equal to 2 — the legacy layout
    ids = rng.integers(3, 90, (3, 16))
    ids[0, 7] = 95
    ids[1, 12] = 95
    ids[2, 3] = 95
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).pooler_output.numpy()
    ours = model.apply({"params": params}, jnp.asarray(ids)).pooled
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=2e-5)
