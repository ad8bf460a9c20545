"""Numerical parity of the Flax T5/CLIP text encoders vs the torch
reference implementations (transformers), on random-init tiny configs.

This is the §4 test-pyramid layer SURVEY.md calls "per-module numerical-
parity tests against recorded activations from the torch models" — here the
torch model runs live (CPU) instead of from recordings, since transformers
is in the image and the configs are tiny.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tdm_tpu.io import convert  # noqa: E402
from tdm_tpu.models import clip as clip_mod, t5 as t5_mod  # noqa: E402


def _numpy_sd(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def t5_pair():
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False,
    )
    torch.manual_seed(0)
    hf = transformers.T5EncoderModel(hf_cfg).eval()
    cfg = t5_mod.T5Config.tiny()
    model = t5_mod.T5Encoder(cfg=cfg)
    params = convert.to_jax(convert.t5_encoder_params(_numpy_sd(hf)))
    return hf, model, params


def test_t5_parity(t5_pair):
    hf, model, params = t5_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 8:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    ours = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
    )
    # padded positions' outputs are junk in both impls (HF also emits values
    # there); compare only real tokens
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(ours)[np.broadcast_to(m, ours.shape)],
        ref[np.broadcast_to(m, ref.shape)],
        atol=2e-4, rtol=2e-4,
    )


def test_t5_relative_bias_buckets():
    """Bucket function matches HF's _relative_position_bucket."""
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    rel = np.arange(-40, 40)[None, :] - np.zeros((1, 1), np.int64)
    ours = t5_mod.relative_position_bucket(rel, 32, 128)
    theirs = HFT5Attention._relative_position_bucket(
        torch.tensor(rel), bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.fixture(scope="module")
def clip_pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=128, max_position_embeddings=16,
        eos_token_id=95, bos_token_id=94, hidden_act="quick_gelu",
        attention_dropout=0.0, projection_dim=24,
    )
    torch.manual_seed(1)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = clip_mod.CLIPTextConfig(
        vocab_size=96, hidden=32, num_heads=4, num_layers=2,
        max_positions=16, eos_token_id=95, projection_dim=24,
        dtype=jnp.float32, attn_impl="xla",
    )
    model = clip_mod.CLIPTextEncoder(cfg=cfg)
    params = convert.to_jax(convert.clip_text_params(_numpy_sd(hf)))
    return hf, model, params


def test_clip_parity(clip_pair):
    hf, model, params = clip_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 94, (2, 16))
    ids[0, 10] = 95  # EOS mid-sequence
    ids[1, 15] = 95
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids))
    ours = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(ours.last_hidden_state),
        ref.last_hidden_state.numpy(), atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.pooled), ref.text_embeds.numpy(), atol=2e-4, rtol=2e-4
    )


def test_clip_penultimate_hidden_exposed(clip_pair):
    """SD3/SDXL read the penultimate hidden layer (clip-skip); our output
    carries every layer's input so pipelines can pick."""
    _, model, params = clip_pair
    ids = jnp.zeros((1, 16), jnp.int32)
    out = model.apply({"params": params}, ids)
    assert len(out.hidden_states) == 3  # embeddings + 2 layers
    assert out.hidden_states[-1].shape == out.last_hidden_state.shape
