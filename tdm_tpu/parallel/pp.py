"""Pipeline parallelism over the scan-stacked layer axis.

The reference has no pipeline parallelism (its distributed story is DDP +
optional ZeRO-3, `/root/reference/src/main.py:141-160,321-323`); this module
is a TPU-native extension for *depth* scaling: the stacked `blocks` subtree
every full-size model already carries (`scan_layers=True`, CLAUDE.md
invariants) is sharded along its leading layer axis over a `pp` mesh axis,
so each chip holds only `L / n_pp` layers of weights AND optimizer state —
the memory lever when even FSDP's per-chip shard of a single layer stack is
too big, and the latency lever across slices where FSDP's all-gathers would
ride DCN.

Design — classic GPipe microbatch schedule, expressed as a `lax.scan` over
"ticks" inside `shard_map`:

  * stage `s` (one mesh coordinate along `pp`) holds layers
    `[s·L/S, (s+1)·L/S)` as its local slice of the stacked params;
  * the per-device batch splits into M microbatches; at tick `t`, stage `s`
    runs its layers on microbatch `t − s` (garbage during fill/drain — the
    (S−1)/(M+S−1) bubble — masked out of outputs and hence out of grads);
  * activations rotate one stage forward per tick via a single
    `lax.ppermute` (compiled to an ICI collective-permute, the same
    primitive the ring attention uses — `ops/ring_attention.py`);
  * the last stage collects finished microbatches; a final masked `psum`
    replicates the result over the `pp` axis.

Differentiating straight through this schedule gives correct pipelined
backward for free: `ppermute`'s transpose is the reverse permute, the
bubble's garbage compute carries zero cotangent through the output masks.
Combine with per-block remat (the models' `remat=True`) for the standard
1F1B-memory-like profile without hand scheduling.

Parity vs the plain scan forward is exact up to float reassociation
(`tests/test_pp.py`, 8-device CPU mesh, fwd + grads).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PP_AXIS = "pp"


def _pvary(x, axis_name: str):
    """pcast to varying over `axis_name` unless already varying (mirrors
    ops/ring_attention.py's vma handling)."""

    def one(a):
        if axis_name in getattr(jax.typeof(a), "vma", frozenset()):
            return a
        return jax.lax.pcast(a, axis_name, to="varying")

    return jax.tree.map(one, x)


def pipeline_blocks(
    block_apply: Callable[..., Any],
    blocks_local: Any,
    x: Any,
    bcast: Any,
    *,
    static: Any = None,
    axis_name: str = PP_AXIS,
    num_microbatches: int,
):
    """Run the GPipe schedule. MUST be called inside shard_map with
    `blocks_local` = this stage's layer slice (stacked params sharded on
    their leading axis over `axis_name`).

    block_apply(layer_params, carry, bcast_mb[, static]) -> carry — ONE
    layer.
    x: carry pytree, leading axis = per-device batch B.
    bcast: per-sample conditioning pytree, leading axis B (each stage
    indexes the microbatch it is currently processing).
    static: optional batch-independent conditioning pytree (e.g. RoPE
    tables) handed to every block_apply call unchanged — NOT microbatched.
    """
    s = jax.lax.axis_index(axis_name)
    n_stages = jax.lax.psum(1, axis_name)  # static
    m = int(num_microbatches)
    batch = jax.tree.leaves(x)[0].shape[0]
    if batch % m:
        raise ValueError(
            f"per-device batch {batch} not divisible by "
            f"num_microbatches={m}"
        )

    def to_mb(tree):
        return jax.tree.map(
            lambda a: a.reshape(m, batch // m, *a.shape[1:]), tree
        )

    # everything the schedule touches varies by stage (mb = t − s), so lift
    # the replicated inputs to varying-over-pp once up front
    x_mb = _pvary(to_mb(x), axis_name)
    bcast_mb = _pvary(to_mb(bcast), axis_name)
    static_v = None if static is None else _pvary(static, axis_name)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        act, outbuf = carry
        mb = jnp.clip(t - s, 0, m - 1)
        inject = jax.tree.map(lambda a: a[mb], x_mb)
        # stage 0 starts a fresh microbatch; others continue what the
        # previous stage handed over (ppermute at the end of last tick)
        act = jax.tree.map(
            lambda i, a: jnp.where(s == 0, i, a), inject, act
        )
        bc = jax.tree.map(lambda a: a[mb], bcast_mb)

        def layer(h, lp):
            if static_v is None:
                return block_apply(lp, h, bc), None
            return block_apply(lp, h, bc, static_v), None

        act, _ = jax.lax.scan(layer, act, blocks_local)

        out_idx = t - (n_stages - 1)
        valid = jnp.logical_and(s == n_stages - 1, out_idx >= 0)
        idx = jnp.maximum(out_idx, 0)
        outbuf = jax.tree.map(
            lambda buf, a: buf.at[idx].set(jnp.where(valid, a, buf[idx])),
            outbuf,
            act,
        )
        act = jax.lax.ppermute(act, axis_name, perm)
        return (act, outbuf), None

    act0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb)
    out0 = jax.tree.map(jnp.zeros_like, x_mb)
    (_, outbuf), _ = jax.lax.scan(
        tick,
        (act0, out0),
        jnp.arange(m + n_stages - 1),
    )
    # only the last stage's buffer is real — masked psum replicates it
    is_last = s == n_stages - 1
    out = jax.tree.map(
        lambda o: jax.lax.psum(o * is_last.astype(o.dtype), axis_name),
        outbuf,
    )
    return jax.tree.map(
        lambda a: a.reshape(batch, *a.shape[2:]), out
    )


def make_pp_forward(
    prologue: Callable,
    block_apply: Callable[..., Any],
    epilogue: Callable,
    mesh: Mesh,
    *,
    pp_axis: str = PP_AXIS,
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    blocks_key: str = "blocks",
):
    """Assemble a pipelined full-model forward from three stage callables:

      prologue(rest_params, *inputs) -> (carry, bcast, aux)
                                     or (carry, bcast, static, aux)
      block_apply(layer_params, carry, bcast[, static]) -> carry
      epilogue(rest_params, carry, aux) -> out

    `static` (4-tuple form) is batch-independent conditioning (e.g. RoPE
    tables) handed to every block unchanged rather than microbatched.

    COMPOSES with FSDP and TP: any mesh axis beyond (`data_axis`, pp) —
    'fsdp', 'tp' — is left AUTOMATIC (partial-auto shard_map, the same
    mechanism models/cogvideox.py::sequence_parallel_apply uses for
    SP×TP), so params placed with `pp_fsdp_shardings` /
    `pp_tp_fsdp_shardings` get the ZeRO-3 gathers and megatron psums
    GSPMD-inserted inside each stage's layer slice.

    Returns fn(params, *inputs) usable under an outer jit; params is the
    FULL param tree with the stacked layers under `blocks_key`. The blocks
    subtree is sharded over `pp_axis` (layer axis), everything else
    replicated; inputs/outputs batch-shard over `data_axis` when given.
    Prologue/epilogue run replicated on every stage (they are a few percent
    of FLOPs in every model here); only the block stack pipelines.
    """
    if pp_axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no {pp_axis!r} axis")
    n_pp = mesh.shape[pp_axis]
    m_default = num_microbatches or n_pp

    def fn(params, *inputs):
        blocks = params[blocks_key]
        rest = {k: v for k, v in params.items() if k != blocks_key}
        n_layers = jax.tree.leaves(blocks)[0].shape[0]
        if n_layers % n_pp:
            raise ValueError(
                f"{n_layers} layers not divisible by pp={n_pp}"
            )
        dspec = P(data_axis) if data_axis else P()

        def body(rest, blocks_local, *inputs):
            pro = prologue(rest, *inputs)
            if len(pro) == 4:
                carry, bcast, static, aux = pro
            else:
                carry, bcast, aux = pro
                static = None
            carry = pipeline_blocks(
                block_apply,
                blocks_local,
                carry,
                bcast,
                static=static,
                axis_name=pp_axis,
                num_microbatches=m_default,
            )
            return epilogue(rest, carry, aux)

        manual = {pp_axis} | ({data_axis} if data_axis else set())
        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(pp_axis)) + (dspec,) * len(inputs),
            out_specs=dspec,
            axis_names=manual,
        )(rest, blocks, *inputs)

    return fn


def pp_param_shardings(
    params: Any,
    mesh: Mesh,
    *,
    pp_axis: str = PP_AXIS,
    blocks_key: str = "blocks",
) -> Any:
    """NamedShardings placing the stacked `blocks` subtree's layer axis on
    the pp mesh axis and replicating everything else — the placement
    make_pp_forward's in_specs expect (use with jax.device_put /
    jit in_shardings so each stage holds only its own layers)."""
    rep = NamedSharding(mesh, P())
    pp = NamedSharding(mesh, P(pp_axis))
    n_pp = mesh.shape[pp_axis]

    def spec(path, leaf):
        keys = {
            getattr(p, "key", getattr(p, "name", None)) for p in path
        }
        # matches anywhere in the path so full TrainStates work too — the
        # optimizer/EMA mirrors of the stacked layers shard the same way
        if (
            blocks_key in keys
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] % n_pp == 0
        ):
            return pp
        return rep

    return jax.tree_util.tree_map_with_path(spec, params)


def pp_fsdp_shardings(
    params: Any,
    mesh: Mesh,
    *,
    pp_axis: str = PP_AXIS,
    fsdp_axis: str = "fsdp",
    blocks_key: str = "blocks",
    min_size: int = 2**16,
) -> Any:
    """PP × FSDP placement: stacked `blocks` leaves put their layer axis on
    `pp_axis` AND ZeRO-3-shard their largest remaining dim over
    `fsdp_axis` (per-stage weight shards get sharded again — gathers are
    GSPMD-inserted inside make_pp_forward's partial-auto shard_map);
    non-block leaves follow the plain fsdp rule. `min_size` is the
    PER-STAGE element count below which a block leaf keeps its non-layer
    dims replicated (mirrors parallel/mesh.py fsdp_spec's exclusion)."""
    import numpy as _np

    from tdm_tpu.parallel import mesh as _pmesh

    n_pp = mesh.shape[pp_axis]
    n_fsdp = mesh.shape.get(fsdp_axis, 1)

    def spec(path, leaf):
        keys = {
            getattr(p, "key", getattr(p, "name", None)) for p in path
        }
        shape = getattr(leaf, "shape", ())
        if (
            blocks_key in keys
            and len(shape) >= 1
            and shape[0] % n_pp == 0
        ):
            rest_dims = shape[1:]
            s = [pp_axis] + [None] * len(rest_dims)
            if (
                n_fsdp > 1
                and rest_dims
                and int(_np.prod(shape)) // n_pp >= min_size
            ):
                # largest divisible non-layer dim; ties → later dim
                best, best_i = -1, None
                for i, d in enumerate(rest_dims):
                    if d % n_fsdp == 0 and d >= best:
                        best, best_i = d, i
                if best_i is not None:
                    s[1 + best_i] = fsdp_axis
            return NamedSharding(mesh, P(*s))
        return NamedSharding(
            mesh, _pmesh.fsdp_spec(shape, n_fsdp, min_size=min_size)
        )

    return jax.tree_util.tree_map_with_path(spec, params)


def pp_tp_fsdp_shardings(
    params: Any,
    mesh: Mesh,
    *,
    pp_axis: str = PP_AXIS,
    blocks_key: str = "blocks",
    min_size: int = 2**16,
) -> Any:
    """Full combined placement: stacked `blocks` leaves put their layer
    axis on `pp_axis` and delegate the remaining dims to the megatron +
    ZeRO-3 rule (parallel/tp.py tp_fsdp_spec — name-driven column/row 'tp'
    specs index from the RIGHT, so they apply to the per-layer tail
    unchanged); non-block leaves follow tp_fsdp_spec directly. Axes absent
    from the mesh degrade to size 1. Use with make_pp_forward, where every
    axis beyond (data, pp) stays automatic — GSPMD inserts the megatron
    psums and ZeRO-3 gathers inside each stage."""
    from tdm_tpu.parallel import tp as _ptp

    shape_of = dict(mesh.shape)
    n_pp = shape_of[pp_axis]
    n_tp = shape_of.get(_ptp.TP_AXIS, 1)
    n_fsdp = shape_of.get("fsdp", 1)

    def spec(path, leaf):
        names = _ptp._path_names(path)
        shape = getattr(leaf, "shape", ())
        if blocks_key in names and len(shape) >= 1 and shape[0] % n_pp == 0:
            tail = _ptp.tp_fsdp_spec(
                names, shape[1:], n_tp, n_fsdp, min_size=min_size
            )
            tail = tuple(tail) + (None,) * (len(shape) - 1 - len(tuple(tail)))
            return NamedSharding(mesh, P(pp_axis, *tail))
        return NamedSharding(
            mesh,
            _ptp.tp_fsdp_spec(names, shape, n_tp, n_fsdp, min_size=min_size),
        )

    return jax.tree_util.tree_map_with_path(spec, params)
