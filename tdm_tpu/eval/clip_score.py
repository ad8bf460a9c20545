"""CLIP score — automated text↔image alignment metric over the generation
paths.

The reference verifies distilled quality only by HUMAN inspection: fixed-
seed grids during training (`/root/reference/src/training.py:107-121`) and
a README user study (`/root/reference/README.md:17-27`). This module adds
the standard automated proxy — CLIPScore(prompt, image) = max(0, 100·cos)
between the CLIP text and image embeddings (Hessel et al., the metric every
diffusion-distillation paper reports) — so student-vs-teacher quality can
be tracked numerically on TPU, e.g. `tdm-eval --compare_teacher`.

Both towers are the in-repo Flax CLIP (models/clip.py); weights load from a
stock `transformers.CLIPModel` checkpoint directory (config.json +
safetensors, e.g. openai/clip-vit-large-patch14) through the strict
converters in io/convert.py. Torch parity is pinned by
tests/test_clip_score.py. Embedding forwards are jitted with params as
ARGUMENTS (never closures — see docs/ENVIRONMENT_NOTES.md #4).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tdm_tpu.models import clip as clip_mod

# OpenAI CLIP preprocessing constants (transformers CLIPImageProcessor)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(
    images: jnp.ndarray, image_size: int = 224
) -> jnp.ndarray:
    """Pipeline output [B, H, W, 3] float in [0,1] → CLIP input
    [B, 3, S, S]. Square resize (bicubic) + mean/std normalization — for
    the square generations this framework produces, identical to the HF
    processor's shortest-side-resize + center-crop."""
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(
            x, (b, image_size, image_size, c), method="bicubic"
        )
        x = jnp.clip(x, 0.0, 1.0)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return jnp.transpose(x, (0, 3, 1, 2))


def clip_score(
    image_embeds: jnp.ndarray, text_embeds: jnp.ndarray
) -> jnp.ndarray:
    """max(0, 100·cos) per (image, text) pair — the CLIPScore definition
    (w=2.5·E[max(cos,0)] in the paper; reported ×100 by convention)."""
    img = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return jnp.maximum(jnp.sum(img * txt, axis=-1), 0.0) * 100.0


def _configs_from_hf(cfg: dict) -> tuple[clip_mod.CLIPTextConfig, clip_mod.CLIPVisionConfig]:
    t, v = cfg["text_config"], cfg["vision_config"]
    proj = cfg.get("projection_dim", 512)
    text = clip_mod.CLIPTextConfig(
        vocab_size=t.get("vocab_size", 49408),
        hidden=t.get("hidden_size", 512),
        num_heads=t.get("num_attention_heads", 8),
        num_layers=t.get("num_hidden_layers", 12),
        mlp_ratio=t.get("intermediate_size", 2048) // t.get("hidden_size", 512),
        max_positions=t.get("max_position_embeddings", 77),
        eos_token_id=t.get("eos_token_id", 49407),
        activation=t.get("hidden_act", "quick_gelu"),
        projection_dim=proj,
    )
    vision = clip_mod.CLIPVisionConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        hidden=v.get("hidden_size", 768),
        num_heads=v.get("num_attention_heads", 12),
        num_layers=v.get("num_hidden_layers", 12),
        mlp_ratio=v.get("intermediate_size", 3072) // v.get("hidden_size", 768),
        activation=v.get("hidden_act", "quick_gelu"),
        projection_dim=proj,
    )
    return text, vision


class CLIPScorer:
    """Holds both CLIP towers and scores (image, prompt) batches.

    >>> scorer = CLIPScorer.from_pretrained("/ckpts/clip-vit-large-patch14")
    >>> scores = scorer.score(pipe_out.images, prompts)  # [B] in [0, 100]
    """

    def __init__(
        self,
        text_cfg: clip_mod.CLIPTextConfig,
        vision_cfg: clip_mod.CLIPVisionConfig,
        text_params,
        vision_params,
        tokenizer=None,
    ):
        if text_cfg.projection_dim is None or vision_cfg.projection_dim is None:
            raise ValueError(
                "CLIP score needs projected embeddings — both configs must "
                "set projection_dim (the CLIPModel checkpoint layout)"
            )
        self.text_cfg, self.vision_cfg = text_cfg, vision_cfg
        self.text_model = clip_mod.CLIPTextEncoder(cfg=text_cfg)
        self.vision_model = clip_mod.CLIPVisionEncoder(cfg=vision_cfg)
        self.text_params = text_params
        self.vision_params = vision_params
        self.tokenizer = tokenizer
        self._embed_text = jax.jit(
            lambda p, ids: self.text_model.apply({"params": p}, ids).pooled
        )
        self._embed_image = jax.jit(
            lambda p, px: self.vision_model.apply({"params": p}, px).pooled
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "CLIPScorer":
        """Load a stock HF CLIPModel directory (config.json + safetensors
        + tokenizer files)."""
        from tdm_tpu.io import convert

        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        text_cfg, vision_cfg = _configs_from_hf(cfg)
        sd = convert.load_torch_state_dict(path)
        text_params, vision_params, _ = convert.clip_model_params(sd)
        tokenizer = None
        try:  # tokenizer is optional — score() also accepts raw ids
            import transformers

            tokenizer = transformers.CLIPTokenizerFast.from_pretrained(path)
        except Exception:  # pragma: no cover - missing files/transformers
            pass
        return cls(
            text_cfg, vision_cfg,
            convert.to_jax(text_params), convert.to_jax(vision_params),
            tokenizer=tokenizer,
        )

    def tokenize(self, prompts: Sequence[str]) -> jnp.ndarray:
        if self.tokenizer is None:
            raise ValueError(
                "no tokenizer attached — pass input_ids to score(), or load "
                "via from_pretrained() on a directory with tokenizer files"
            )
        out = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.text_cfg.max_positions, return_tensors="np",
        )
        return jnp.asarray(out["input_ids"])

    def embed_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, H, W, 3] float in [0,1] (pipeline output)."""
        px = preprocess_images(images, self.vision_cfg.image_size)
        return self._embed_image(self.vision_params, px)

    def embed_texts(
        self,
        prompts: Optional[Sequence[str]] = None,
        input_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if input_ids is None:
            input_ids = self.tokenize(prompts)
        return self._embed_text(self.text_params, input_ids)

    def score(
        self,
        images: jnp.ndarray,
        prompts: Optional[Sequence[str]] = None,
        input_ids: Optional[jnp.ndarray] = None,
    ) -> np.ndarray:
        """[B] CLIP scores for (images[i], prompts[i]) pairs."""
        img = self.embed_images(images)
        txt = self.embed_texts(prompts, input_ids)
        return np.asarray(clip_score(img, txt))
