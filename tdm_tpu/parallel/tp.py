"""Tensor parallelism for the denoiser transformers — a GSPMD sharding rule.

The reference has no tensor parallelism at all (its distributed story is
DDP + optional ZeRO-3, `/root/reference/src/main.py:141-160,321-323`); this
module is a TPU-native extension for *latency* scaling: a single image/video
denoise is partitioned over chips, so serving gets faster even at batch 1,
where data parallelism cannot help.

Design — Megatron-style column/row parallel linear layers, expressed purely
as parameter shardings and left to XLA's SPMD partitioner (GSPMD). No model
code changes, no shard_map: every attention/FF projection in the zoo uses
the diffusers-mirroring names (`to_q/to_k/to_v/to_out`, joint-stream
`add_{q,k,v}_proj`/`to_add_out`, FeedForward `proj_in`/`proj_out`), so a
name-driven rule covers PixArt, SD3 MMDiT (incl. 3.5 dual attention), the
SD1.5 UNet transformer blocks, and CogVideoX uniformly:

  * column-parallel (shard the OUTPUT features): q/k/v projections and the
    FF up-projection. The activation comes out sharded head-wise; the
    attention itself then runs embarrassingly parallel over heads.
  * row-parallel (shard the INPUT features): the attention out-projection
    and the FF down-projection. XLA inserts ONE psum per block pair — the
    same two-collectives-per-layer count as hand-written Megatron.

Scan-stacked trees (`scan_layers=True`, leading L axis on every kernel —
see CLAUDE.md invariants) are handled by indexing dims from the right.
Dimensions not divisible by the tp axis stay replicated (graceful, never
wrong). Everything else (norms, embedders, adaLN tables, output head) is
replicated; combine with the `fsdp` rule for those if memory demands it.

Under jit, parity with the unsharded forward is exact up to float
reassociation of the partitioned contractions (tested to ~1e-5 in f32 on
the 8-device CPU mesh, `tests/test_tp.py`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TP_AXIS = "tp"

# Dense modules whose OUTPUT features are sharded (column-parallel).
_COLUMN = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"}
# Dense modules whose INPUT features are sharded (row-parallel).
_ROW = {"to_out", "to_add_out"}
# FeedForward-internal names, disambiguated by their parent module so the
# top-level `proj_out` output head (PixArt/SD3/CogVideoX all have one) and
# the patch-embed `proj` stay replicated.
_FF_PARENTS = {"ff", "ff_context", "net", "mlp"}
# SHARED adaLN modulation heads kept replicated under the fsdp rule (see
# tp_fsdp_spec): PixArt's adaln-single 't_block' and the models' final
# 'norm_out' — one small kernel each (t_block: 8M of PixArt's 610M), whose
# fsdp-sharded gradient forces a GSPMD full-remat reshard of a tiny
# per-sample cotangent every step. The PER-BLOCK modulation linears
# (SD3/CogVideoX norm1/norm1_context/norm2) are NOT here: collectively
# they are ~30% of those models' params, and replicating them breaks the
# ZeRO-3 HBM budget (tests/test_hbm_audit.py).
_MODULATION_HEADS = {"t_block", "norm_out"}


def make_tp_mesh(
    n_data: Optional[int] = None, n_tp: int = 1, *, devices=None
) -> Mesh:
    """('data', 'tp') mesh; defaults to all devices on 'tp' when n_data is
    not given and n_tp covers the host. Put ICI-adjacent devices on 'tp' —
    the per-layer psum is the latency-critical collective (multi-slice:
    'tp' never crosses DCN, parallel/mesh.py dcn_ordered_devices)."""
    from tdm_tpu.parallel.mesh import dcn_ordered_devices

    devices = dcn_ordered_devices(devices, inner=n_tp)
    if n_data is None:
        n_data = devices.size // n_tp
    assert n_data * n_tp == devices.size, (
        f"mesh {n_data}x{n_tp} != {devices.size} devices"
    )
    return Mesh(devices.reshape(n_data, n_tp), (DATA_AXIS, TP_AXIS))


def _path_names(path) -> tuple[str, ...]:
    return tuple(str(k.key) for k in path if hasattr(k, "key"))


def tp_spec(
    names: tuple[str, ...], shape: tuple[int, ...], n_tp: int, axis: str = TP_AXIS
) -> P:
    """PartitionSpec for one parameter, by its module path and shape.

    `names` is the flax path, e.g. ('params','blocks','attn1','to_q','kernel').
    Kernels are (..., in, out); biases (..., out); scan-stacked trees carry a
    leading layer axis — dims are therefore indexed from the RIGHT.
    """
    if n_tp <= 1 or len(names) < 2:
        return P()
    leaf, module = names[-1], names[-2]
    parent = names[-3] if len(names) >= 3 else ""
    rank = len(shape)

    def shard_from_right(offset: int) -> P:
        # offset 0 = last dim, 1 = second-to-last
        dim = rank - 1 - offset
        if dim < 0 or shape[dim] % n_tp != 0:
            return P()
        spec = [None] * rank
        spec[dim] = axis
        return P(*spec)

    column = module in _COLUMN or (module == "proj_in" and parent in _FF_PARENTS)
    row = module in _ROW or (module == "proj_out" and parent in _FF_PARENTS)
    if column and leaf in ("kernel", "bias"):
        return shard_from_right(0)
    if row and leaf == "kernel":
        return shard_from_right(1)
    # row-parallel bias stays replicated (added once, after the psum)
    return P()


def make_train_mesh(
    n_data: int, n_fsdp: int = 1, n_tp: int = 1, *, devices=None
) -> Mesh:
    """('data','fsdp','tp') mesh for tensor-parallel TRAINING on top of the
    DDP+ZeRO-3 surface. Innermost ('tp') gets ICI-adjacent devices — the
    per-layer psum is latency-critical; 'fsdp' all-gathers amortize. On
    multi-slice pods the model axes (fsdp×tp) stay inside one ICI slice
    (parallel/mesh.py dcn_ordered_devices)."""
    from tdm_tpu.parallel.mesh import dcn_ordered_devices

    devices = dcn_ordered_devices(devices, inner=n_fsdp * n_tp)
    assert n_data * n_fsdp * n_tp == devices.size, (
        f"mesh {n_data}x{n_fsdp}x{n_tp} != {devices.size} devices"
    )
    return Mesh(
        devices.reshape(n_data, n_fsdp, n_tp), (DATA_AXIS, "fsdp", TP_AXIS)
    )


def tp_fsdp_spec(
    names: tuple[str, ...],
    shape: tuple[int, ...],
    n_tp: int,
    n_fsdp: int,
    *,
    min_size: int = 2**16,
):
    """Combined rule for training state: attention/FF projections shard over
    'tp' by name (megatron), with ZeRO-3 layered on top — the largest
    remaining divisible dim of a tp-sharded kernel shards over 'fsdp';
    everything else (norms, embedders, optimizer moments whose blockwise
    layout breaks the name rule's shape check) falls back to the plain
    shape-based fsdp rule. Never wrong on mismatched shapes: tp_spec
    degrades to replicated, fsdp_spec skips small/indivisible leaves."""
    from tdm_tpu.parallel.mesh import FSDP_AXIS, fsdp_spec

    # Shared adaLN modulation heads stay REPLICATED: their gradient is a
    # batch contraction of a tiny per-sample activation; fsdp-sharding the
    # kernel makes GSPMD reshard that cotangent through its "involuntary
    # full rematerialization" fallback every step (all-gather + repartition
    # on the ICI critical path). The heads are ~1% of params (PixArt
    # t_block: 8M of 610M), so replicating them is the cheaper layout.
    if any(n in _MODULATION_HEADS for n in names[-3:]):
        return P()
    tspec = tp_spec(names, shape, n_tp)
    tp_dim = next(
        (i for i, a in enumerate(tspec) if a == TP_AXIS), None
    )
    if tp_dim is None:
        return fsdp_spec(shape, n_fsdp, min_size)
    spec = [None] * len(shape)
    spec[tp_dim] = TP_AXIS
    if n_fsdp > 1 and int(np.prod(shape)) >= min_size:
        cands = sorted(
            (s, i)
            for i, s in enumerate(shape)
            if i != tp_dim and s % n_fsdp == 0
        )
        if cands:
            spec[cands[-1][1]] = FSDP_AXIS
    return P(*spec)


def tp_fsdp_shardings(
    tree: Any, mesh: Mesh, *, min_size: int = 2**16
) -> Any:
    """Pytree of NamedShardings for a train-state tree under the combined
    ('fsdp','tp') rule; axes absent from the mesh degrade to size 1."""
    shape = dict(mesh.shape)
    n_tp = shape.get(TP_AXIS, 1)
    n_fsdp = shape.get("fsdp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh,
            tp_fsdp_spec(
                _path_names(path), jnp.shape(x), n_tp, n_fsdp,
                min_size=min_size,
            ),
        ),
        tree,
    )


def tp_shardings(params: Any, mesh: Mesh, *, axis: str = TP_AXIS) -> Any:
    """Pytree of NamedShardings under the tensor-parallel rule."""
    if axis not in mesh.axis_names:
        raise ValueError(
            f"mesh {dict(mesh.shape)} has no {axis!r} axis — build it with "
            "parallel.tp.make_tp_mesh (a plain ('data',) mesh belongs on "
            "pipe.data_parallel_mesh instead)"
        )
    n_tp = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(
            mesh, tp_spec(_path_names(path), p.shape, n_tp, axis)
        ),
        params,
    )


def shard_params_tp(params: Any, mesh: Mesh, *, axis: str = TP_AXIS) -> Any:
    """Place a parameter tree with the tensor-parallel rule."""
    return jax.device_put(params, tp_shardings(params, mesh, axis=axis))
