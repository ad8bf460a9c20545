"""CLIP text + vision encoders (Flax) — SD-family prompt conditioning and
the CLIP-score evaluation tower.

TPU-native rebuild of `transformers.CLIPTextModel(WithProjection)` as the
reference consumes it: imported at `src/main.py:41`, used inside the SD1.5
pipeline (CLIP-L, `README.md:95`), and SD3's triple-encoder stack
(CLIP-L + CLIP-G pooled/sequence + T5, `README.md:48`).

Architecture:
  * learned token + absolute position embeddings (max 77 positions)
  * pre-LN transformer with CAUSAL self-attention (CLIP text is a causal LM
    trunk), quick-GELU MLP (CLIP-L; 'gelu' for OpenCLIP-G)
  * final LayerNorm; pooled output = hidden state at each sequence's EOS
    token (argmax trick over ids == eos), optionally × text_projection
    (CLIPTextModelWithProjection, the SD3/G-encoder variant)

SD pipelines read BOTH the last hidden state (sequence conditioning; SDXL/SD3
actually read the penultimate layer — `output_layer` knob) and the pooled
vector. Parity vs torch is pinned by tests/test_text_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768  # CLIP-L; 1280 for OpenCLIP-G
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: int = 4
    max_positions: int = 77
    eos_token_id: int = 49407
    activation: str = "quick_gelu"  # 'gelu' for OpenCLIP-G
    projection_dim: Optional[int] = None  # set → WithProjection variant
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=96, hidden=32, num_heads=4, num_layers=2,
            max_positions=16, eos_token_id=95, dtype=jnp.float32,
            attn_impl="xla",
        )


class CLIPOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # [B, S, D] (after final LN)
    pooled: jnp.ndarray  # [B, D] or [B, projection_dim]
    hidden_states: tuple  # per-layer inputs incl. embeddings (for clip-skip)


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.cfg
        b, s, d = x.shape
        head_dim = c.hidden // c.num_heads
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(c.dtype)
        q = nn.Dense(c.hidden, dtype=c.dtype, name="q_proj")(h)
        k = nn.Dense(c.hidden, dtype=c.dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden, dtype=c.dtype, name="v_proj")(h)

        def split(t):
            return t.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) * (head_dim**-0.5)
        logits = logits + causal_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        attn = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, split(v),
            preferred_element_type=jnp.float32,
        ).astype(c.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, c.hidden)
        x = x + nn.Dense(c.hidden, dtype=c.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(c.dtype)
        h = nn.Dense(c.hidden * c.mlp_ratio, dtype=c.dtype, name="fc1")(h)
        if c.activation == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.hidden, dtype=c.dtype, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    """__call__(input_ids [B,S]) → CLIPOutput. Padding is handled by the
    causal mask + EOS pooling convention (CLIP attends over the full padded
    sequence like the torch model — pads follow EOS and are causally
    invisible to earlier tokens)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.hidden), jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.max_positions, c.hidden), jnp.float32,
        )
        x = (jnp.take(tok, input_ids, axis=0) + pos[None, :s]).astype(c.dtype)

        causal = jnp.where(
            jnp.tril(jnp.ones((s, s), bool)), 0.0, -1e9
        )[None, None].astype(jnp.float32)

        hidden_states = [x]
        for i in range(c.num_layers):
            x = CLIPBlock(cfg=c, name=f"layers_{i}")(x, causal)
            hidden_states.append(x)

        last = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(x).astype(c.dtype)

        # pooled = hidden at the first EOS token per sequence (HF pools on
        # `(ids == eos).argmax(-1)`). Legacy checkpoints (incl. stock
        # openai/clip-vit-large-patch14) carry eos_token_id == 2 from
        # before transformers PR #24773; HF's compat branch pools at the
        # HIGHEST token id per row (EOT = top of the CLIP vocab) — match
        # it, else (ids == 2) never hits and pooling silently lands on BOS
        if c.eos_token_id == 2:
            eos_pos = jnp.argmax(input_ids, axis=1)
        else:
            eos_pos = jnp.argmax(
                (input_ids == c.eos_token_id).astype(jnp.int32), axis=1
            )
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0]
        if c.projection_dim is not None:
            pooled = nn.Dense(
                c.projection_dim, use_bias=False, dtype=c.dtype,
                name="text_projection",
            )(pooled)
        return CLIPOutput(
            last_hidden_state=last, pooled=pooled, hidden_states=tuple(hidden_states)
        )


# ---------------------------------------------------------------------------
# CLIP vision tower (ViT) — the image half of CLIP score evaluation.
# The reference verifies quality only by human inspection of fixed-seed
# grids (`/root/reference/src/training.py:107-121`, README user study);
# this tower enables an AUTOMATED student-vs-teacher quality metric
# (eval/clip_score.py) on top of the same generation paths.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14  # ViT-L/14, the standard CLIP-score backbone
    hidden: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    mlp_ratio: int = 4
    activation: str = "quick_gelu"
    projection_dim: Optional[int] = 768  # set → WithProjection variant
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=16, patch_size=4, hidden=32, num_heads=4,
            num_layers=2, projection_dim=24, dtype=jnp.float32,
        )

    def _text_view(self) -> CLIPTextConfig:
        """The block-hyperparameter view CLIPBlock needs (vision blocks are
        the same pre-LN transformer block, just without the causal mask)."""
        return CLIPTextConfig(
            hidden=self.hidden, num_heads=self.num_heads,
            num_layers=self.num_layers, mlp_ratio=self.mlp_ratio,
            activation=self.activation, layer_norm_eps=self.layer_norm_eps,
            dtype=self.dtype,
        )


class CLIPVisionEncoder(nn.Module):
    """__call__(pixel_values [B, 3, H, W], already CLIP-normalized) →
    CLIPOutput. torch-parity semantics (transformers CLIPVisionTransformer):
    embeddings = [class token; conv patches] + learned positions →
    pre_layrnorm (HF's spelling) → non-causal pre-LN blocks;
    `last_hidden_state` is returned WITHOUT the final LN, `pooled` is
    post_layernorm(token 0), optionally × visual_projection."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        b = pixel_values.shape[0]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(c.dtype)
        patches = nn.Conv(
            c.hidden, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False, dtype=c.dtype, name="patch_embedding",
        )(x)
        patches = patches.reshape(b, -1, c.hidden)
        n_pos = patches.shape[1] + 1
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden,),
            jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, c.hidden), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(c.dtype), (b, 1, c.hidden)), patches],
            axis=1,
        )
        x = (x + pos[None].astype(c.dtype)).astype(c.dtype)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm"
        )(x).astype(c.dtype)

        block_cfg = c._text_view()
        zero_bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
        hidden_states = [x]
        for i in range(c.num_layers):
            x = CLIPBlock(cfg=block_cfg, name=f"layers_{i}")(x, zero_bias)
            hidden_states.append(x)

        pooled = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="post_layernorm"
        )(x[:, 0]).astype(c.dtype)
        if c.projection_dim is not None:
            pooled = nn.Dense(
                c.projection_dim, use_bias=False, dtype=c.dtype,
                name="visual_projection",
            )(pooled)
        return CLIPOutput(
            last_hidden_state=x, pooled=pooled, hidden_states=tuple(hidden_states)
        )
