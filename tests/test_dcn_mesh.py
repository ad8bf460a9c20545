"""Multi-slice (DCN) device ordering — `parallel/mesh.py
dcn_ordered_devices`.

On multi-slice TPU pods, `jax.devices()` order is not guaranteed to group
by slice; reshaping it straight into a ('data','fsdp','tp') mesh can put
an fsdp/tp axis ACROSS the DCN boundary, moving per-layer all-gathers and
psums from ~100 GB/s ICI onto ~10 GB/s DCN. The ordering rule groups
devices slice-major so model axes stay in-slice and only the data axis's
once-per-step gradient psum crosses DCN. No multi-slice hardware here, so
slices are emulated via `slice_key` (the hook the rule reads instead of
`device.slice_index` when given). Reference has no analog (2 GPUs on one
NVLink island, /root/reference/README.md:160).
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdm_tpu.parallel import mesh as pmesh


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    slice_index: int


def test_groups_slice_major():
    # interleaved enumeration order: slice of each device alternates
    devs = [FakeDev(i, i % 2) for i in range(8)]
    out = pmesh.dcn_ordered_devices(devs, inner=4)
    assert [d.id for d in out] == [0, 2, 4, 6, 1, 3, 5, 7]
    # reshape(data=2, model=4): each data row is one slice
    rows = np.asarray(out).reshape(2, 4)
    for row in rows:
        assert len({d.slice_index for d in row}) == 1


def test_single_slice_and_no_attribute_pass_through():
    devs = [FakeDev(i, 0) for i in range(4)]
    assert [d.id for d in pmesh.dcn_ordered_devices(devs, inner=2)] == [
        0,
        1,
        2,
        3,
    ]

    class Bare:  # CPU-style device: no slice_index at all
        def __init__(self, i):
            self.id = i

    bare = [Bare(i) for i in range(4)]
    assert [d.id for d in pmesh.dcn_ordered_devices(bare, inner=4)] == [
        0,
        1,
        2,
        3,
    ]


def test_model_axis_across_dcn_rejected():
    devs = [FakeDev(i, i % 2) for i in range(8)]  # 4 devices per slice
    with pytest.raises(ValueError, match="inside one ICI slice"):
        pmesh.dcn_ordered_devices(devs, inner=8)


def test_unequal_slices_rejected():
    devs = [FakeDev(i, 0 if i < 3 else 1) for i in range(8)]
    with pytest.raises(ValueError, match="unequal slice sizes"):
        pmesh.dcn_ordered_devices(devs, inner=1)


def test_hybrid_mesh_executes():
    """End-to-end on the 8-device CPU mesh with two EMULATED slices in
    interleaved enumeration order: the ('data','fsdp') 2x4 mesh built from
    the reordered devices keeps each fsdp group in one emulated slice, and
    a param-sharded jitted reduction still executes and matches."""
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provides 8 virtual CPU devices"
    ordered = pmesh.dcn_ordered_devices(
        devs[:8], inner=4, slice_key=lambda d: d.id % 2
    )
    rows = np.asarray(ordered).reshape(2, 4)
    for row in rows:  # fsdp groups never straddle the emulated slices
        assert len({d.id % 2 for d in row}) == 1
    mesh = Mesh(rows, ("data", "fsdp"))

    w = np.arange(32.0, dtype=np.float32).reshape(8, 4)
    x = np.ones((4, 8), np.float32)
    w_sh = jax.device_put(w, NamedSharding(mesh, P("fsdp", None)))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda a, b: b @ a)(w_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-6)
