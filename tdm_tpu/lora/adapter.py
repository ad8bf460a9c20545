"""LoRA adapters as pytrees of low-rank factors, merged on-device.

TPU-native rebuild of the reference's LoRA surface (SURVEY.md §2 table B):
  * peft `LoraConfig`/`get_peft_model` (reference `src/main.py:43`),
  * diffusers `load_lora_weights` + `set_adapters(['tdm'], [0.125])` runtime
    scaling (reference `README.md:49-50,70,96,119`),
  * the kohya export `get_module_kohya_state_dict` (`src/utils.py:76-93`)
    lives in `tdm_tpu.lora.io`.

Design stance: torch LoRA implementations hook every Linear's forward with an
extra rank-r matmul pair. On TPU that is the wrong shape — dozens of skinny
[S, r]×[r, D] matmuls under-utilize the 128×128 MXU and add kernel-launch/
fusion boundaries. Instead the adapter is a *parallel pytree* of (a, b)
factors and merging is one fused tree-wide update

    W' = W + scale · (alpha / r) · (a @ b)

executed on-device (a handful of [in, r]×[r, out] matmuls + adds, microseconds
for a 0.6B model). Inference merges once at load; the `set_adapters` scale
knob re-merges from the pristine base (cheap, still on-device). LoRA
*training* takes the frozen base as a traced argument and merges inside the
jitted step, so gradients flow only into the (a, b) leaves — the TPU
equivalent of peft's trainable-adapter wrapping.

Conventions:
  * Factors follow the Flax kernel layout: for a Dense kernel [in, out],
    a: [in, r], b: [r, out] (the torch/kohya layout `down [r, in]`,
    `up [out, r]` is transposed at the IO boundary, `lora/io.py`).
  * An adapter entry lives at the same tree path as the kernel it adapts:
    params `.../to_q/kernel` ↔ lora `.../to_q/{a, b}`.
  * alpha defaults to r (effective factor alpha/r = 1), matching peft's
    default and the reference export which writes alpha = rank
    (`src/utils.py:87-92`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LoRA:
    """One named adapter: nested {module-path: {'a': [in,r], 'b': [r,out]}}
    plus static per-module alpha (flat '/'-joined path → float)."""

    params: Any
    alpha: tuple = struct.field(pytree_node=False, default=())  # ((path, α), ...)

    @property
    def alpha_map(self) -> dict:
        return dict(self.alpha)

    def rank_of(self, entry: dict) -> int:
        return entry["a"].shape[-1]


def _flatten(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) and not ("a" in v and "b" in v and len(v) == 2):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def path_str(path: tuple) -> str:
    return "/".join(path)


def default_target(path: tuple, kernel: jnp.ndarray) -> bool:
    """Which kernels get adapters by default: 2-D Dense kernels of attention
    and FF projections — the to_q/to_k/to_v/to_out(+add_*) set the released
    TDM LoRAs adapt (diffusers `load_lora_weights` targets attention
    processors, `README.md:49`)."""
    if kernel.ndim not in (2, 3):  # 3 = scan-stacked [L, in, out]
        return False
    name = path[-1] if path else ""
    return any(
        t in name
        for t in (
            "to_q", "to_k", "to_v", "to_out",
            "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
            "proj_in", "proj_out",
        )
    )


def init_lora(
    params: Any,
    rng: jax.Array,
    rank: int = 4,
    *,
    target: Callable[[tuple, jnp.ndarray], bool] = default_target,
    alpha: Optional[float] = None,
    dtype: jnp.dtype = jnp.float32,
) -> LoRA:
    """Fresh adapter over every matching kernel: a ~ Kaiming-uniform, b = 0
    (delta starts at zero — peft initialization)."""
    flat_params = _flatten_params(params)
    entries: dict[tuple, dict] = {}
    alphas = []
    keys = {}
    for path, kernel in sorted(flat_params.items()):
        if path[-1] != "kernel" or not target(path[:-1], kernel):
            continue
        keys[path[:-1]] = kernel.shape
    rngs = jax.random.split(rng, max(len(keys), 1))
    for i, (mpath, shape) in enumerate(sorted(keys.items())):
        # scan-stacked kernels [L, in, out] get per-layer factor stacks
        layers = shape[:-2]
        d_in, d_out = shape[-2:]
        bound = 1.0 / jnp.sqrt(jnp.asarray(d_in, jnp.float32))
        a = jax.random.uniform(
            rngs[i], (*layers, d_in, rank), dtype, minval=-bound, maxval=bound
        )
        b = jnp.zeros((*layers, rank, d_out), dtype)
        entries[mpath] = {"a": a, "b": b}
        alphas.append((path_str(mpath), float(alpha if alpha is not None else rank)))
    return LoRA(params=_unflatten(entries), alpha=tuple(alphas))


def _flatten_params(params: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(_flatten_params(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge(params: Any, lora: LoRA, scale: float = 1.0) -> Any:
    """W' = W + scale·(alpha/r)·(a@b) over every adapted kernel — the
    `set_adapters([...], [scale])` knob (`README.md:50`: scale 0.125).

    Pure function of (params, lora, scale): call at load for inference, or
    inside the jitted train step for LoRA training. Unmatched params pass
    through unchanged (frozen-base semantics of peft)."""
    flat_lora = _flatten(lora.params)
    alpha_map = lora.alpha_map
    flat_params = _flatten_params(params)
    for mpath, entry in flat_lora.items():
        kpath = mpath + ("kernel",)
        if kpath not in flat_params:
            raise KeyError(f"LoRA entry {path_str(mpath)} has no matching kernel")
        a, b = entry["a"], entry["b"]
        r = a.shape[-1]
        eff = scale * alpha_map.get(path_str(mpath), float(r)) / r
        w = flat_params[kpath]
        if a.ndim == 2:
            delta = jnp.dot(
                a.astype(jnp.float32), b.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        else:  # stacked [L, in, r] @ [L, r, out] → [L, in, out]
            delta = jnp.einsum(
                "...ir,...ro->...io",
                a.astype(jnp.float32), b.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        flat_params[kpath] = (w.astype(jnp.float32) + eff * delta).astype(w.dtype)
    return _unflatten(flat_params)


def extract_lora(
    base_params: Any,
    tuned_params: Any,
    rank: int = 32,
    *,
    target: Callable[[tuple, jnp.ndarray], bool] = default_target,
) -> LoRA:
    """Distill a full-weight finetune into a LoRA by truncated SVD of the
    per-kernel delta: ΔW ≈ (U√S)(√S Vᵀ). This is how trained TDM students
    become the reference's released artifact form (full-weight demo
    training → LoRA checkpoints, `README.md:140-144`). Handles both plain
    [in, out] and scan-stacked [L, in, out] kernels (batched SVD). alpha is
    set to rank so the effective factor is exactly 1."""
    fb = _flatten_params(base_params)
    ft = _flatten_params(tuned_params)
    entries: dict[tuple, dict] = {}
    alphas = []
    for kpath, w0 in fb.items():
        if kpath[-1] != "kernel" or not target(kpath[:-1], w0):
            continue
        delta = (
            jnp.asarray(ft[kpath], jnp.float32) - jnp.asarray(w0, jnp.float32)
        )
        r = min(rank, delta.shape[-2], delta.shape[-1])
        u, s, vt = jnp.linalg.svd(delta, full_matrices=False)
        sq = jnp.sqrt(s[..., :r])
        a = u[..., :, :r] * sq[..., None, :]  # [..., in, r]
        b = sq[..., :, None] * vt[..., :r, :]  # [..., r, out]
        entries[kpath[:-1]] = {"a": a, "b": b}
        alphas.append((path_str(kpath[:-1]), float(r)))
    return LoRA(params=_unflatten(entries), alpha=tuple(alphas))


def wrap_denoise_fn(denoise_fn, lora_template: LoRA, scale: float = 1.0):
    """LoRA-training adapter: returns fn(lora_params, x, t, cond, base) that
    merges `lora_params` into the frozen `base` inside the traced step, so
    only the (a, b) leaves carry gradients — the TPU equivalent of peft's
    get_peft_model over a frozen transformer (`src/main.py:43`).

    The base tree is a traced ARGUMENT, never a closure: a closed-over
    full-size param tree would be baked into the jitted step as HLO
    constants (gigabytes of literals → multi-minute compiles; the repo's
    params-are-arguments invariant). `train.tdm.build_train_step` threads
    its `teacher` argument through as the base."""
    alpha = lora_template.alpha

    def fn(lora_params, x, t, cond, base):
        frozen = jax.lax.stop_gradient(base)
        merged = merge(frozen, LoRA(params=lora_params, alpha=alpha), scale)
        return denoise_fn(merged, x, t, cond)

    return fn
