"""T5 encoder (Flax) — the text conditioning backbone.

TPU-native rebuild of `transformers.T5EncoderModel` as consumed by the
reference: PixArt conditions on T5(-XXL v1.1) sequence embeddings with
max_length 120 (`src/main.py:161-165,417-430`), SD3 additionally feeds
T5-XXL as its third encoder (`README.md:48`), CogVideoX uses T5 too.

Architecture (T5 v1.1):
  * shared token embedding; no absolute positions — a learned *relative*
    position bias (bucketed log-distance, 32 buckets / max distance 128)
    added to the attention logits, computed once in block 0 and shared.
  * per block: [RMSNorm → self-attn (no biases, UNSCALED dot product —
    T5 folds 1/√d into init) → residual] then [RMSNorm → gated-GELU FF
    (wi_0 ⊙ gelu, wi_1 linear) → residual]; final RMSNorm.
  * attention mask: additive -inf on padded keys.

The parameter tree mirrors HF names (`encoder/block/0/layer/0/SelfAttention/q`
…) so `io/convert.py` ports safetensors checkpoints 1:1. Numerical parity vs
the torch implementation is pinned by tests/test_text_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tdm_tpu.models import layers as L


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096  # t5-v1_1-xxl
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=128, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=2, dtype=jnp.float32, attn_impl="xla",
        )


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucketed relative positions (HF `_relative_position_bucket`
    with bidirectional=True): half the buckets for each sign, small offsets
    exact, large offsets log-spaced. Host-side numpy — S is static, so the
    bucket table bakes into the compiled program as a constant."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        c = self.cfg
        b, s, _ = x.shape
        inner = c.num_heads * c.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=c.dtype, name="v")(x)

        if self.has_rel_bias:
            rel_bias = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (c.rel_buckets, c.num_heads),
                jnp.float32,
            )
            ctx = np.arange(s)
            buckets = relative_position_bucket(
                ctx[None, :] - ctx[:, None], c.rel_buckets, c.rel_max_distance
            )  # [Sq, Sk]
            pos_bias = jnp.take(rel_bias, jnp.asarray(buckets), axis=0)
            pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # [1,H,Sq,Sk]

        def split(t):
            return t.reshape(b, s, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        # T5 uses an UNSCALED dot product with an additive [H, Sq, Sk] bias —
        # the generic fused kernel takes only a key mask, so the bias path
        # uses the explicit formulation (S ≤ 120 for text: O(S²) is tiny).
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        )
        logits = logits + pos_bias.astype(jnp.float32)
        if mask is not None:
            neg = jnp.asarray(-1e9, jnp.float32)
            logits = logits + jnp.where(
                mask[:, None, None, :].astype(bool), 0.0, neg
            )
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="o")(out), pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        c = self.cfg
        h = L.RMSNorm(eps=c.layer_norm_eps, dtype=c.dtype, name="ln_attn")(x)
        attn_out, pos_bias = T5Attention(
            cfg=c, has_rel_bias=self.has_rel_bias, name="SelfAttention"
        )(h, mask, pos_bias)
        x = x + attn_out
        h = L.RMSNorm(eps=c.layer_norm_eps, dtype=c.dtype, name="ln_ff")(x)
        wi0 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_0")(h)
        wi1 = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=c.dtype, name="wo")(h)
        return x, pos_bias


class T5Encoder(nn.Module):
    """__call__(input_ids [B,S], attention_mask [B,S]) → [B,S,d_model].

    Replaces the frozen `T5EncoderModel` forward of `src/main.py:459-461`
    (`text_encoder(input_ids, attention_mask)[0]`)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        emb = self.param(
            "shared_embedding",
            nn.initializers.normal(1.0),
            (c.vocab_size, c.d_model),
            jnp.float32,
        )
        x = jnp.take(emb, input_ids, axis=0).astype(c.dtype)
        pos_bias = None
        for i in range(c.num_layers):
            x, pos_bias = T5Block(
                cfg=c, has_rel_bias=(i == 0), name=f"block_{i}"
            )(x, attention_mask, pos_bias)
        return L.RMSNorm(
            eps=c.layer_norm_eps, dtype=c.dtype, name="final_layer_norm"
        )(x)
