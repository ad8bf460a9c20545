"""Device mesh + sharding rules — the TPU-native distributed runtime.

Replaces the reference's entire distributed stack (SURVEY.md §5): HF
accelerate process groups over NCCL (`src/main.py:93-98`), DDP wrapping
(`321-323`), implicit gradient allreduce in `backward` (`535`), and optional
DeepSpeed ZeRO-3 parameter sharding with frozen-model exclusion (`141-160`).

On TPU none of that is a runtime — it's a compile-time layout problem:
  * one `Mesh` over ('data', 'fsdp') axes; batch sharded on 'data',
    parameters optionally sharded on 'fsdp' (the ZeRO-3 equivalent);
  * `jax.jit` with NamedSharding-annotated inputs compiles the gradient
    mean into an ICI psum and the FSDP gathers/scatters into XLA
    all-gather / reduce-scatter — no NCCL calls to port.

The reference's recipe is plain DP over 2 GPUs (`README.md:160`); TP/PP/
SP do not exist anywhere in it (SURVEY.md §2 table B, "Distributed") —
here they are beyond-reference extensions (parallel/tp.py, parallel/pp.py,
models/cogvideox.py SP). On multi-slice pods `dcn_ordered_devices` keeps
every model axis inside one ICI slice so only the data axis's gradient
psum (once per step) crosses DCN — the standard hybrid ICI×DCN layout.
"""

from __future__ import annotations

import contextvars
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"


def maybe_initialize_distributed() -> bool:
    """Multi-host (pod / multi-slice) runtime init — the `accelerate launch
    --num_processes=N` equivalent (reference `README.md:158-162`). On TPU
    pods with the standard env (TPU_WORKER_HOSTNAMES etc.) a bare
    `jax.distributed.initialize()` self-configures; for manual setups set
    TDM_COORDINATOR (host:port), TDM_NUM_PROCESSES and TDM_PROCESS_ID.
    Strictly opt-in (returns False otherwise): auto-detecting pod env vars
    misfires on tunneled single-chip setups that still export them."""
    import os

    if os.environ.get("TDM_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["TDM_COORDINATOR"],
            num_processes=int(os.environ["TDM_NUM_PROCESSES"]),
            process_id=int(os.environ["TDM_PROCESS_ID"]),
        )
        return True
    if os.environ.get("TDM_MULTIHOST") == "1":
        jax.distributed.initialize()  # pod env self-configures
        return True
    return False


def dcn_ordered_devices(
    devices=None, *, inner: int = 1, slice_key=None
) -> np.ndarray:
    """Slice-aware device order for hybrid ICI×DCN meshes (multi-slice
    pods / GKE multislice). Returns the devices grouped slice-major so
    that a row-major reshape to ``(data, <model axes...>)`` — where the
    model axes' sizes multiply to `inner` — keeps every model axis
    (fsdp/tp/pp/sp) INSIDE one ICI slice: their per-layer all-gathers and
    psums ride ICI, and only the data axis — whose single gradient psum
    per step is the one collective that tolerates DCN latency — spans
    slices. This is the layout `jax.experimental.mesh_utils.
    create_hybrid_device_mesh` produces, derived here directly from the
    devices' `slice_index` so it also covers capped/virtual device lists.

    The reference never faces this (2 GPUs on one NVLink island,
    `/root/reference/README.md:160`); on TPU it is the difference between
    FSDP gathers at ~100 GB/s ICI and ~10 GB/s DCN.

    Single-slice hardware and CPU meshes (no `slice_index` attribute)
    return the input order unchanged. Raises when the model-axis product
    does not divide the per-slice device count (a model axis would
    straddle DCN) or slices are unequal.
    """
    devices = list(devices if devices is not None else jax.devices())
    key = slice_key or (lambda d: getattr(d, "slice_index", None))
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    if len(groups) == 1:
        return np.asarray(devices)
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(
            f"unequal slice sizes {sorted(sizes)} — cannot build a "
            "rectangular hybrid mesh from these devices"
        )
    per_slice = sizes.pop()
    if per_slice % inner != 0:
        raise ValueError(
            f"model axes (product {inner}) do not divide the {per_slice} "
            "devices per slice — fsdp/tp/pp axes must stay inside one ICI "
            "slice; lower the model-axis sizes or use full slices"
        )
    try:  # numeric slice ids sort numerically; fall back for mixed types
        order = sorted(groups)
    except TypeError:
        order = sorted(groups, key=str)
    return np.concatenate([np.asarray(groups[k]) for k in order])


def make_mesh(
    n_data: Optional[int] = None, n_fsdp: int = 1, *, devices=None
) -> Mesh:
    """('data', 'fsdp') mesh. Defaults to all devices on the data axis —
    the reference's topology (pure DP). Put ICI-adjacent devices on 'fsdp'
    when sharding params so gathers ride the fastest links."""
    devices = dcn_ordered_devices(devices, inner=n_fsdp)
    if n_data is None:
        n_data = devices.size // n_fsdp
    assert n_data * n_fsdp == devices.size, (
        f"mesh {n_data}x{n_fsdp} != {devices.size} devices"
    )
    return Mesh(devices.reshape(n_data, n_fsdp), (DATA_AXIS, FSDP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(array, mesh: Mesh) -> jax.Array:
    """Host-local batch rows → one global batch Array sharded over 'data'.

    Single host: a plain device_put. Multi-host: each process contributes
    ONLY its local rows (`jax.make_array_from_process_local_data`), so a
    pod loads global_batch/process_count rows per host instead of every
    host materializing a global-size batch — the per-host DataLoader shard
    semantics of the reference's accelerate.prepare(dataloader)
    (`src/main.py:321-323`)."""
    arr = np.asarray(array)
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, arr)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over every data-carrying axis.

    'fsdp' is INCLUDED: ZeRO-3 ranks are data ranks (DeepSpeed semantics,
    reference src/main.py:141-160) — params shard over 'fsdp' AND each
    fsdp device processes distinct rows (weights all-gather per layer).
    Sharding the batch over 'data' alone would make fsdp pairs compute the
    same rows redundantly — an accidental (and less efficient) tensor
    parallelism. Model-parallel axes ('tp', 'sp') stay replicated: their
    whole point is cooperating on the SAME rows.

    EXCEPT under sequence parallelism: on a ('data','fsdp','sp') mesh the
    sp shard_map's manual batch spec covers 'data' only, so 'fsdp' devices
    cooperate on the same rows too and fsdp degrades (deliberately) to
    pure ZeRO weight/optimizer sharding — the HBM relief is the point for
    video-scale states (tests/test_tdm_video.py sp+fsdp exactness)."""
    axes = tuple(
        a for a in (DATA_AXIS, FSDP_AXIS) if a in mesh.axis_names
    )
    if "sp" in mesh.axis_names:
        axes = tuple(a for a in axes if a == DATA_AXIS)
    return NamedSharding(mesh, P(axes))


# Set only inside activation_sharding(). A ContextVar (not a module global)
# so tracing model code from another thread — e.g. the serve daemon's worker
# threads compiling while a training trace holds the context — cannot leak
# constraints across threads.
_ACTIVATION_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "tdm_activation_mesh", default=None
)

# The logical activation-layout vocabulary (resolved against the active
# mesh; absent axes drop to None):
BATCH = (DATA_AXIS, FSDP_AXIS)  # rows over every data-carrying axis
HEADS = "tp"  # attention heads under megatron tensor parallelism
FEATURES = "tp"  # row-parallel input features


class activation_sharding:
    """Context manager: trace jitted model code with explicit activation
    sharding constraints (constrain()) resolved against `mesh`.

    Why: GSPMD picks intermediate COTANGENT layouts by local cost model;
    on the combined ('data','fsdp','tp') train mesh it chose inconsistent
    layouts across the attention head split/merge and adaLN reshapes in
    the PixArt backward, hitting the spmd_partitioner "Involuntary full
    rematerialization" path (an all-gather + re-partition of the tensor
    every step — wasted ICI at pod scale; GSPMD resharding corner tracked
    upstream as b/433785288). Pinning the forward activations to their
    natural layouts makes the transposed constraints pin the cotangents
    too, and the warnings disappear (tests/test_tp.py asserts both the
    clean compile and exactness vs the unsharded step).

    Enter it around the CALL (= trace) of the jitted step; constraints
    become part of the compiled program. Without the context, constrain()
    is a no-op and every existing single-device path is unchanged."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        self._token = _ACTIVATION_MESH.set(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVATION_MESH.reset(self._token)
        return False


def constrain(x, *spec):
    """`with_sharding_constraint(x, P(*spec))` against the mesh installed
    by activation_sharding(); no-op otherwise. Each spec entry is an axis
    name, a tuple of axis names, or None; axes missing from the mesh (or
    not dividing the dimension) are dropped — never wrong, only weaker."""
    mesh = _ACTIVATION_MESH.get()
    if mesh is None:
        return x
    resolved = []
    for dim, entry in enumerate(spec):
        names = (
            entry if isinstance(entry, tuple)
            else (entry,) if entry is not None else ()
        )
        names = tuple(n for n in names if n in mesh.axis_names)
        size = int(np.prod([mesh.shape[n] for n in names])) if names else 1
        if not names or x.shape[dim] % size != 0:
            resolved.append(None)
        elif len(names) == 1:
            resolved.append(names[0])
        else:
            resolved.append(names)
    if all(r is None for r in resolved):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*resolved))
    )


def fsdp_spec(shape: tuple[int, ...], n_fsdp: int, min_size: int = 2**16) -> P:
    """ZeRO-3-style rule for one parameter: shard the largest divisible
    axis over 'fsdp'; small params stay replicated (the reference's ZeRO-3
    also excludes frozen/small modules, `src/main.py:141-160`)."""
    if n_fsdp <= 1 or int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest dim; ties → later dim (usually the output features,
    # which keeps matmul-contracting dims whole)
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for i in order:
        if shape[i] % n_fsdp == 0:
            spec: list = [None] * len(shape)
            spec[i] = FSDP_AXIS
            return P(*spec)
    return P()


def fsdp_shardings(params: Any, mesh: Mesh, *, min_size: int = 2**16) -> Any:
    """Pytree of NamedShardings for a parameter tree under the fsdp rule."""
    n_fsdp = mesh.shape[FSDP_AXIS]
    return jax.tree.map(
        lambda p: NamedSharding(mesh, fsdp_spec(p.shape, n_fsdp, min_size)),
        params,
    )


def shard_params(params: Any, mesh: Mesh, *, min_size: int = 2**16) -> Any:
    """Place a parameter tree with the fsdp rule ('fsdp' size 1 → fully
    replicated, the reference's default DP)."""
    return jax.device_put(params, fsdp_shardings(params, mesh, min_size=min_size))
