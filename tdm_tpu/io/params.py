"""Param-tree ↔ safetensors serialization (our native checkpoint artifact).

Orbax (utils/checkpoint.py) owns full TRAIN state; this module is the
lightweight interchange format for MODEL weights — flat '/'-joined tree keys
in one safetensors file, loadable from any framework. Complements the
HF-layout converters (io/convert.py: theirs → ours) with ours ↔ disk."""

from __future__ import annotations

from typing import Any

import numpy as np
from safetensors.numpy import load_file, save_file


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params(params: Any, path: str, *, dtype=None) -> None:
    flat = _flatten(params)
    if dtype is not None:
        flat = {
            k: v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v
            for k, v in flat.items()
        }
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


def load_params(path: str, *, to_jnp: bool = True) -> Any:
    flat = load_file(path)
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    if to_jnp:
        import jax.numpy as jnp
        import jax

        tree = jax.tree.map(jnp.asarray, tree)
    return tree
