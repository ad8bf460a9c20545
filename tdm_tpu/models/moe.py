"""Mixture-of-Experts feed-forward + expert parallelism (research extension).

The reference's model surface has no MoE (`/root/reference` binds dense
PixArt/SD/CogVideoX denoisers only) — this module is the TPU-native *depth
of the parallelism story*: with it, every mesh axis the scaling playbook
names is real here (data / fsdp / tp / sp / pp / **ep**). The design is the
classic GShard/Switch static-capacity formulation [Lepikhin et al. 2020,
arXiv:2006.16668; Fedus et al. 2021, arXiv:2101.03961], chosen over
"dropless" sort-based routing because it is all static shapes and dense
einsums — exactly what XLA tiles onto the MXU and what GSPMD can shard by
annotation alone:

  * router: one fp32 Dense → softmax over E experts; top-k gates
    (renormalized over the chosen k, Mixtral-style);
  * dispatch: position-in-expert by cumsum in token order, tokens past the
    per-expert capacity C = ceil(cf · k · T / E) are DROPPED (their combine
    weight is 0 → the residual stream carries them through unchanged — for
    a *residual* MLP branch that is the standard GShard behavior);
  * expert compute: [E, C, D] batched einsums against stacked expert
    weights [E, D, F] / [E, F, D] — one `jnp.einsum` per projection, no
    per-expert Python loop;
  * combine: weighted gather back to [T, D].

Expert parallelism is pure GSPMD: `ep_shardings` puts the expert axis of
every `experts_*` param leaf on the mesh's 'ep' axis (layer-stacked leaves
shard axis 1, the axis after `nn.scan`'s layer axis). The [E, C, D]
dispatched activations then propagate 'ep' sharding and XLA inserts the
all-to-alls — the same annotate-don't-rewrite mechanism as `parallel/tp.py`
(megatron) — so the SAME model code runs single-chip or expert-sharded.

The Switch load-balance auxiliary loss is sowed into the `"losses"`
collection (`apply(..., mutable=["losses"]) → moe_aux_loss(vars)`): it is a
PRE-TRAINING objective; TDM distillation of an already-balanced MoE student
needs no aux term (routing is frozen-ish and differentiable end-to-end).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EP_AXIS = "ep"


class MoEFeedForward(nn.Module):
    """Drop-in replacement for `layers.FeedForward` with E experts.

    `__call__(x [B,S,D]) → [B,S,D]`. Capacity factor ≥ 1 bounds per-expert
    work; dropped tokens contribute 0 to the MLP branch (residual carries
    them). With `num_experts=1, top_k=1` and capacity ≥ tokens this is the
    dense MLP exactly (tested)."""

    num_experts: int
    top_k: int = 2
    mult: int = 4
    capacity_factor: float = 1.25
    activation: str = "gelu-approximate"
    normalize_gates: bool = True
    aux_loss_weight: float = 1.0  # scale recorded in the sowed loss
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e, k = self.num_experts, self.top_k
        if not 1 <= k <= e:
            raise ValueError(f"top_k={k} must be in [1, num_experts={e}]")
        b, s, d = x.shape
        t = b * s
        f = d * self.mult
        cap = int(math.ceil(self.capacity_factor * k * t / e))
        cap = max(1, min(cap, t))

        xt = x.reshape(t, d)
        # router in fp32: gate decisions are precision-sensitive
        logits = nn.Dense(
            e, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32, name="router",
        )(xt.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
        gate_vals, gate_idx = jax.lax.top_k(probs, k)  # [T, k]
        if self.normalize_gates:
            gate_vals = gate_vals / jnp.maximum(
                jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
            )

        # Switch aux loss: E · Σ_e (dispatch fraction)·(mean prob) — sowed,
        # consumed by pre-training loops via apply(mutable=["losses"])
        first = jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32)
        aux = (
            self.aux_loss_weight
            * e
            * jnp.sum(jnp.mean(first, axis=0) * jnp.mean(probs, axis=0))
        )
        self.sow("losses", "moe_aux", aux)

        # position-in-expert: cumsum in (slot-major, token) order so slot 0
        # claims capacity before slot 1, matching GShard's priority
        slot_hot = jax.nn.one_hot(gate_idx.T, e, dtype=jnp.int32)  # [k,T,E]
        pos = jnp.cumsum(slot_hot.reshape(k * t, e), axis=0) - 1
        pos = pos.reshape(k, t, e)
        within = (pos < cap) & (slot_hot > 0)  # [k, T, E]
        pos_c = jax.nn.one_hot(
            jnp.clip(pos, 0, cap - 1), cap, dtype=jnp.float32
        )  # [k, T, E, C]
        disp_k = pos_c * within[..., None].astype(jnp.float32)
        dispatch = jnp.sum(disp_k, axis=0)  # [T, E, C] ∈ {0,1}
        combine = jnp.sum(
            disp_k * gate_vals.T[:, :, None, None].astype(jnp.float32),
            axis=0,
        )  # [T, E, C]

        w_in = self.param(
            "experts_in",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (e, d, f * (2 if self.activation == "geglu" else 1)),
            jnp.float32,
        )
        b_in = self.param(
            "experts_in_bias", nn.initializers.zeros,
            (e, f * (2 if self.activation == "geglu" else 1)), jnp.float32,
        )
        w_out = self.param(
            "experts_out",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (e, f, d), jnp.float32,
        )
        b_out = self.param(
            "experts_out_bias", nn.initializers.zeros, (e, d), jnp.float32
        )

        cdt = self.dtype
        ex_in = jnp.einsum(
            "tec,td->ecd", dispatch.astype(cdt), xt.astype(cdt)
        )  # [E, C, D]
        h = (
            jnp.einsum("ecd,edf->ecf", ex_in, w_in.astype(cdt))
            + b_in.astype(cdt)[:, None, :]
        )
        if self.activation == "geglu":
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=True)
        elif self.activation == "gelu-approximate":
            h = nn.gelu(h, approximate=True)
        elif self.activation == "gelu":
            h = nn.gelu(h, approximate=False)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        ex_out = (
            jnp.einsum("ecf,efd->ecd", h, w_out.astype(cdt))
            + b_out.astype(cdt)[:, None, :]
        )  # [E, C, D]
        y = jnp.einsum(
            "tec,ecd->td", combine.astype(cdt), ex_out
        )
        return y.reshape(b, s, d).astype(x.dtype)


def moe_aux_loss(variables: Any) -> jnp.ndarray:
    """Sum every sowed `moe_aux` entry in an `apply(mutable=["losses"])`
    variables dict (scan-stacked layers contribute a [L] vector). Only
    `moe_aux` leaves count — other diagnostics sowed into "losses" by
    other modules are ignored."""
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(
        variables.get("losses", {})
    )[0]
    for path, leaf in flat:
        keys = {
            str(getattr(p, "key", getattr(p, "name", ""))) for p in path
        }
        if "moe_aux" in keys:
            total = total + jnp.sum(leaf)
    return total


def ep_shardings(
    params: Any,
    mesh: Mesh,
    *,
    ep_axis: str = EP_AXIS,
    fsdp_axis: str = "fsdp",
    blocks_key: str = "blocks",
    base_rule=None,
    min_size: int = 2**16,
) -> Any:
    """NamedShardings putting every expert leaf's expert axis on `ep_axis`:
    axis 0 for plain leaves, axis 1 under the scan-stacked `blocks` subtree
    (axis 0 there is the layer axis). When the mesh also has `fsdp_axis`
    (>1), large expert leaves additionally ZeRO-3-shard their largest
    remaining divisible dim over it (the pp_fsdp_shardings composition) —
    without this, an ('data','fsdp','ep') mesh would leave the
    expert-dominated tree no smaller per chip than pure ZeRO-3 at equal
    device count (caught by tests/test_hbm_audit.py). Non-expert leaves
    follow `base_rule` (a (path_names, shape) → PartitionSpec callable,
    e.g. a partial of `parallel.tp.tp_fsdp_spec`) or stay replicated —
    the same name-driven GSPMD annotation style as `parallel/tp.py`.

    Raises when an expert leaf's expert dim does not divide the mesh's
    `ep_axis` size — silently replicating the expert stacks would be a
    run with no expert parallelism at all (OOM at full size). Leaves whose
    SHAPE doesn't expose the expert axis at the expected position (e.g.
    blockwise-quantized optimizer mirrors) fall through to `base_rule`."""
    import numpy as _np

    n_ep = mesh.shape[ep_axis]
    n_fsdp = dict(mesh.shape).get(fsdp_axis, 1)

    def spec(path, leaf):
        names = [
            str(getattr(p, "key", getattr(p, "name", ""))) for p in path
        ]
        shape = getattr(leaf, "shape", ())
        if any(n.startswith("experts") for n in names):
            ax = 1 if blocks_key in names else 0
            if len(shape) > ax:
                if shape[ax] % n_ep:
                    raise ValueError(
                        f"expert leaf {'/'.join(names)} has "
                        f"{shape[ax]} experts on axis {ax}, not divisible "
                        f"by the {ep_axis!r} mesh axis ({n_ep}) — pick a "
                        "divisor or drop the ep axis"
                    )
                s: list = [None] * len(shape)
                s[ax] = ep_axis
                if (
                    n_fsdp > 1
                    and int(_np.prod(shape)) // n_ep >= min_size
                ):
                    # largest divisible dim AFTER the expert axis (never
                    # the scan layer axis or the expert axis); ties →
                    # later dim
                    best, best_i = -1, None
                    for i, d in enumerate(shape):
                        if i > ax and d % n_fsdp == 0 and d >= best:
                            best, best_i = d, i
                    if best_i is not None:
                        s[best_i] = fsdp_axis
                return NamedSharding(mesh, P(*s))
        if base_rule is not None:
            return NamedSharding(mesh, base_rule(names, shape))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)
