"""LoRA safetensors interchange: kohya-ss and diffusers/peft formats.

Replaces the reference's LoRA I/O surface:
  * kohya export `get_module_kohya_state_dict` (`src/utils.py:74-93`): peft
    keys with `lora_A → lora_down`, `lora_B → lora_up`, dots→underscores in
    the module path, and a per-module `.alpha` tensor.
  * diffusers `pipe.load_lora_weights(repo, weight_name=..., adapter_name=
    'tdm')` (`README.md:49,96,119`) — reads either format from a local
    safetensors file.

Layout at the boundary: torch stores Linear weights [out, in], so
`lora_down.weight` is [r, in] and `lora_up.weight` is [out, r]; our factors
are Flax-layout a: [in, r], b: [r, out] (see `lora/adapter.py`) — transposed
here, exactly once, at (de)serialization.

Key mapping: file keys address torch module paths (e.g.
`lora_unet_transformer_blocks_0_attn1_to_q`); our trees use '/'-joined Flax
paths (`blocks_0/attn1/to_q`). The per-model-family translation is a pair of
string functions; the defaults cover our denoisers' naming (which mirrors HF
module names for exactly this reason).
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import numpy as np
from safetensors.numpy import load_file, save_file

from tdm_tpu.lora.adapter import LoRA, _flatten, _unflatten, path_str


def default_to_file_key(path: str, prefix: str) -> str:
    """'blocks_0/attn1/to_q' → 'lora_unet_blocks_0_attn1_to_q' style
    (kohya flattens the module path with underscores; the reference keeps
    the last two dots, `src/utils.py:83` — those are '.lora_down.weight',
    appended by the caller)."""
    return f"{prefix}_{path.replace('/', '_')}" if prefix else path.replace("/", "_")


def save_kohya(
    lora: LoRA,
    path: str,
    *,
    prefix: str = "lora_unet",
    dtype=np.float16,
    to_file_key: Callable[[str, str], str] = default_to_file_key,
) -> None:
    """Write a kohya-ss safetensors file (the reference's checkpoint artifact
    format, `src/utils.py:74-93`, consumed by `load_lora_weights`)."""
    tensors: dict[str, np.ndarray] = {}
    alpha_map = lora.alpha_map
    for mpath, entry in sorted(_flatten(lora.params).items()):
        p = path_str(mpath)
        a = np.asarray(entry["a"], dtype=dtype)  # [in, r] or [L, in, r]
        b = np.asarray(entry["b"], dtype=dtype)  # [r, out] or [L, r, out]
        alpha = np.asarray(alpha_map.get(p, float(a.shape[-1])), dtype=dtype)
        if a.ndim == 3:
            # scan-stacked: unstack into per-layer keys so the file stays
            # interchangeable with torch-ecosystem (kohya/diffusers) tooling
            for i in range(a.shape[0]):
                per = (f"{mpath[0]}_{i}",) + mpath[1:]
                key = to_file_key(path_str(per), prefix)
                tensors[f"{key}.lora_down.weight"] = np.ascontiguousarray(a[i].T)
                tensors[f"{key}.lora_up.weight"] = np.ascontiguousarray(b[i].T)
                tensors[f"{key}.alpha"] = alpha
        else:
            key = to_file_key(p, prefix)
            tensors[f"{key}.lora_down.weight"] = np.ascontiguousarray(a.T)
            tensors[f"{key}.lora_up.weight"] = np.ascontiguousarray(b.T)
            tensors[f"{key}.alpha"] = alpha
    save_file(tensors, path)


_PEFT_RE = re.compile(r"^(.*?)\.?lora_(A|B)(?:\.[^.]+)?\.weight$")
_KOHYA_RE = re.compile(r"^(.*)\.lora_(down|up)\.weight$")


def _detect_and_split(key: str) -> Optional[tuple[str, str]]:
    """→ (module_key, 'a'|'b') or None for non-factor keys (alpha etc.)."""
    m = _KOHYA_RE.match(key)
    if m:
        return m.group(1), ("a" if m.group(2) == "down" else "b")
    m = _PEFT_RE.match(key)
    if m:
        return m.group(1), ("a" if m.group(2) == "A" else "b")
    return None


def default_from_file_key(module_key: str) -> str:
    """File module key → our '/'-joined tree path. Handles both dotted peft
    paths ('transformer.blocks.0.attn1.to_q') and kohya underscore paths
    ('lora_unet_blocks_0_attn1_to_q'); strips common family prefixes."""
    key = module_key.replace(".", "/")
    for pre in (
        "lora_unet_", "lora_transformer_", "lora_te_",
        "base_model/model/", "transformer/", "unet/",
    ):
        if key.startswith(pre):
            key = key[len(pre):]
            break
    # kohya underscore-flattened paths: re-split block indices back into
    # path components where our tree uses them ('blocks_0' stays one
    # component because our Flax modules are named 'blocks_0').
    return key


def _resolution_map(params) -> dict[str, tuple]:
    """{underscore-flattened module path: (path, layer|None)} for every
    kernel's parent module — resolves kohya's lossy underscore flattening
    (module names like 'blocks_0' themselves contain underscores, so
    splitting is ambiguous without the model; diffusers' load_lora_weights
    needs the pipeline's model for the same reason). Scan-stacked kernels
    [L, in, out] register one per-layer entry each ('blocks_3_attn1_to_q' →
    ('blocks/attn1/to_q', 3)) so per-layer files load into stacked trees."""
    from tdm_tpu.lora.adapter import _flatten_params

    out: dict[str, tuple] = {}
    for kpath, leaf in _flatten_params(params).items():
        if kpath[-1] != "kernel":
            continue
        p = "/".join(kpath[:-1])
        if getattr(leaf, "ndim", 2) == 3:
            for i in range(leaf.shape[0]):
                flat = "_".join((f"{kpath[0]}_{i}",) + kpath[1:-1])
                out[flat] = (p, i)
        else:
            out[p.replace("/", "_")] = (p, None)
    return out


def load_lora(
    path: str,
    *,
    params=None,
    from_file_key: Callable[[str], str] = default_from_file_key,
    dtype=np.float32,
) -> LoRA:
    """Read a kohya or peft/diffusers safetensors LoRA into our tree form —
    the `load_lora_weights` equivalent (`README.md:45-49`).

    `params`: the target model's param tree; when given, underscore-flattened
    kohya module keys are resolved against its actual module paths."""
    tensors = load_file(path)
    resolve = _resolution_map(params) if params is not None else {}

    def locate(mkey: str) -> tuple[str, int | None]:
        return resolve.get(mkey, (mkey, None))

    entries: dict[tuple, dict] = {}  # path → {'a': arr | {layer: arr}, ...}
    layered: dict[tuple, bool] = {}
    alphas: dict[str, float] = {}
    for key, value in tensors.items():
        split = _detect_and_split(key)
        if split is None:
            if key.endswith(".alpha"):
                pstr, _ = locate(from_file_key(key[: -len(".alpha")]))
                alphas[pstr] = float(np.asarray(value))
            continue
        module_key, which = split
        pstr, layer = locate(from_file_key(module_key))
        p = tuple(pstr.split("/"))
        entry = entries.setdefault(p, {"a": {}, "b": {}})
        # torch layout: down/A [r, in], up/B [out, r] → transpose to Flax
        arr = np.asarray(value, dtype=dtype).T
        if layer is None:
            entry[which] = arr
            layered[p] = False
        else:
            entry[which][layer] = arr
            layered[p] = True
    final: dict[tuple, dict] = {}
    for p, entry in entries.items():
        for which in ("a", "b"):
            v = entry[which]
            if isinstance(v, dict):
                if not v:
                    raise ValueError(
                        f"LoRA file {path}: missing factor {which} at {p}"
                    )
                idx = sorted(v)
                # a gap (missing layer) would silently misalign every
                # subsequent layer in the stacked [L, ...] factor — fail loud
                if idx != list(range(idx[-1] + 1)):
                    missing = sorted(set(range(idx[-1] + 1)) - set(idx))
                    raise ValueError(
                        f"LoRA file {path}: non-contiguous layer indices for "
                        f"{path_str(p)}.{which} — missing layers {missing}"
                    )
                entry[which] = np.stack([v[i] for i in idx])
        final[p] = entry
    alpha = tuple(
        (path_str(p), alphas.get(path_str(p), float(final[p]["a"].shape[-1])))
        for p in sorted(final)
    )
    import jax.numpy as jnp

    tree = _unflatten(
        {
            p: {"a": jnp.asarray(e["a"]), "b": jnp.asarray(e["b"])}
            for p, e in final.items()
        }
    )
    return LoRA(params=tree, alpha=alpha)
