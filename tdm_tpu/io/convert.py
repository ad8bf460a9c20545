"""Checkpoint conversion: HF/torch state dicts → Flax param trees.

Replaces the reference's `from_pretrained` weight loading (HF hub +
safetensors everywhere: `src/main.py:36,125-128,160-176`, `README.md:44-48`)
with an explicit, auditable converter per model family. Torch Linear weights
are [out, in] → Flax Dense kernels [in, out] (transposed); torch Conv
[out, in, kh, kw] → Flax [kh, kw, in, out]; embeddings and norm scales copy
straight through.

Input is a flat {name: numpy array} state dict — from `load_torch_state_dict`
(safetensors file/dir, handles shard indexes) or any torch `state_dict()`
passed through `numpy()`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors file, or a directory of (possibly sharded)
    safetensors files, into {key: np.ndarray}."""
    from safetensors.numpy import load_file

    if os.path.isfile(path):
        return load_file(path)
    index = os.path.join(path, "model.safetensors.index.json")
    files = []
    if os.path.exists(index):
        with open(index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        files = [os.path.join(path, f) for f in files]
    else:
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    out: dict[str, np.ndarray] = {}
    for f in files:
        out.update(load_file(f))
    return out


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(sd: dict, tree: dict, src: str, dst: str, *, bias: bool = True) -> None:
    """torch Linear src.{weight,bias} → dst/{kernel,bias} (kernel transposed)."""
    _set(tree, f"{dst}/kernel", np.ascontiguousarray(sd[f"{src}.weight"].T))
    if bias and f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _conv(sd: dict, tree: dict, src: str, dst: str) -> None:
    """torch Conv2d [out,in,kh,kw] → Flax [kh,kw,in,out]."""
    _set(
        tree, f"{dst}/kernel",
        np.ascontiguousarray(np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0))),
    )
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _norm(sd: dict, tree: dict, src: str, dst: str, *, scale_name: str = "scale") -> None:
    """torch LayerNorm/GroupNorm/RMSNorm {weight,bias} → {scale,bias}."""
    _set(tree, f"{dst}/{scale_name}", sd[f"{src}.weight"])
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


# ---------------------------------------------------------------------------
# T5 encoder (transformers T5EncoderModel → models/t5.T5Encoder)
# ---------------------------------------------------------------------------


def t5_encoder_params(sd: dict[str, np.ndarray]) -> dict:
    """HF T5EncoderModel state dict → T5Encoder param tree.

    Key shapes: q/k/v/o have no bias; DenseGatedActDense is v1.1 gated-GELU;
    relative_attention_bias only exists in block 0."""
    tree: dict = {}
    _set(tree, "shared_embedding", sd["shared.weight"])
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.block\.(\d+)\.", k))
    )
    for i in range(n_layers):
        src = f"encoder.block.{i}"
        dst = f"block_{i}"
        _norm(sd, tree, f"{src}.layer.0.layer_norm", f"{dst}/ln_attn")
        for p in ("q", "k", "v", "o"):
            _linear(sd, tree, f"{src}.layer.0.SelfAttention.{p}",
                    f"{dst}/SelfAttention/{p}", bias=False)
        rel = f"{src}.layer.0.SelfAttention.relative_attention_bias.weight"
        if rel in sd:
            _set(tree, f"{dst}/SelfAttention/relative_attention_bias", sd[rel])
        _norm(sd, tree, f"{src}.layer.1.layer_norm", f"{dst}/ln_ff")
        for p in ("wi_0", "wi_1", "wo"):
            _linear(sd, tree, f"{src}.layer.1.DenseReluDense.{p}",
                    f"{dst}/{p}", bias=False)
    _norm(sd, tree, "encoder.final_layer_norm", "final_layer_norm")
    return tree


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel[WithProjection] → models/clip)
# ---------------------------------------------------------------------------


def clip_text_params(sd: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    _set(tree, "token_embedding", sd["text_model.embeddings.token_embedding.weight"])
    _set(tree, "position_embedding",
         sd["text_model.embeddings.position_embedding.weight"])
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k))
    )
    for i in range(n_layers):
        src = f"text_model.encoder.layers.{i}"
        dst = f"layers_{i}"
        _norm(sd, tree, f"{src}.layer_norm1", f"{dst}/layer_norm1")
        _norm(sd, tree, f"{src}.layer_norm2", f"{dst}/layer_norm2")
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(sd, tree, f"{src}.self_attn.{p}", f"{dst}/{p}")
        _linear(sd, tree, f"{src}.mlp.fc1", f"{dst}/fc1")
        _linear(sd, tree, f"{src}.mlp.fc2", f"{dst}/fc2")
    _norm(sd, tree, "text_model.final_layer_norm", "final_layer_norm")
    if "text_projection.weight" in sd:
        _linear(sd, tree, "text_projection", "text_projection", bias=False)
    return tree


def to_jax(tree: Any, dtype=None) -> Any:
    """numpy tree → jnp tree (optionally casting float leaves)."""
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    import jax

    return jax.tree.map(conv, tree)
