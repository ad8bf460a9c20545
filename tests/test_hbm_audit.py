"""Full-size sharding/HBM-fit audit — SURVEY §7(e)'s "FSDP makes it fit"
claim turned into a checked artifact, no hardware required.

`jax.eval_shape` builds the FULL-size TDM training state (student + critic
+ EMA + their optimizer states, plus the frozen teacher the jitted step
takes as an argument — 4 param-tree roles total, the reference recipe
`src/main.py:168-176`), the real `tp_fsdp_shardings` rule assigns every
leaf its PartitionSpec on abstract v5p mesh shapes (BASELINE.md pod
config), and the test sums the per-chip resident bytes. It fails if a
model/optimizer/rule change overflows the target topology's HBM budget —
before any TPU run would.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import AbstractMesh

from tdm_tpu.parallel import tp as ptp
from tdm_tpu.train import families, optim, tdm

# v5p: 95 GB HBM2e per chip. The persistent state must fit in a fraction
# of it — the rest is activations (bounded by per-block remat), rollout
# intermediates, collective buffers, and XLA workspace.
V5P_HBM_BYTES = 95e9
STATE_BUDGET_FRACTION = 0.70


def _full_state_shapes(family: str):
    """(TrainState shapes, teacher param shapes) for the full-size family,
    int8-Adam pod recipe (README.md:157-178), without allocating anything."""
    bundle = families.build(family, tiny=False)
    params = jax.eval_shape(bundle.init_params, jax.random.PRNGKey(0))
    tx = optim.make_optimizer(1e-5, eight_bit=True)
    state = jax.eval_shape(
        lambda p: tdm.init_state(p, p, tx, tx, use_ema=True), params
    )
    return state, params


def _local_bytes(leaf, sharding, mesh_shape) -> int:
    """Per-chip resident bytes of one leaf under its NamedSharding (ceil
    per sharded dim — XLA pads uneven shards)."""
    dims = list(leaf.shape)
    spec = tuple(sharding.spec) + (None,) * (len(dims) - len(tuple(sharding.spec)))
    for i, entry in enumerate(spec[: len(dims)]):
        if entry is None:
            continue
        axes = entry if isinstance(entry, (tuple, list)) else (entry,)
        div = 1
        for ax in axes:
            div *= mesh_shape[ax]
        dims[i] = -(-dims[i] // div)
    n = 1
    for d in dims:
        n *= d
    return n * jnp.dtype(leaf.dtype).itemsize


def _per_chip_state_bytes(tree, mesh, rule=None) -> int:
    shardings = (rule or ptp.tp_fsdp_shardings)(tree, mesh)
    leaves = jax.tree.leaves(tree)
    sh_leaves = jax.tree.leaves(shardings)
    assert len(leaves) == len(sh_leaves)
    mesh_shape = dict(mesh.shape)
    return sum(
        _local_bytes(x, s, mesh_shape) for x, s in zip(leaves, sh_leaves)
    )


def _total_bytes(tree) -> int:
    return sum(
        x.size * jnp.dtype(x.dtype).itemsize for x in jax.tree.leaves(tree)
    )


# (family, mesh axis sizes) — v5p-8 single host and the BASELINE.md
# v5p-16 pod shape, each in the plain-ZeRO and the tp-composed layout
TOPOLOGIES = [
    ("sd3", dict(data=2, fsdp=4, tp=1)),
    ("sd3", dict(data=2, fsdp=2, tp=2)),
    ("sd3", dict(data=2, fsdp=8, tp=1)),  # v5p-16
    ("cogvideox", dict(data=2, fsdp=4, tp=1)),
    ("cogvideox", dict(data=1, fsdp=8, tp=2)),  # v5p-16
]


@pytest.mark.parametrize("family,axes", TOPOLOGIES)
def test_full_size_state_fits_v5p(family, axes):
    mesh = AbstractMesh(
        (axes["data"], axes["fsdp"], axes["tp"]), ("data", "fsdp", "tp")
    )
    state, teacher = _full_state_shapes(family)
    per_chip = _per_chip_state_bytes(state, mesh) + _per_chip_state_bytes(
        teacher, mesh
    )
    budget = V5P_HBM_BYTES * STATE_BUDGET_FRACTION
    assert per_chip < budget, (
        f"{family} state needs {per_chip / 1e9:.1f} GB/chip on "
        f"{axes} — over the {budget / 1e9:.0f} GB state budget "
        f"({STATE_BUDGET_FRACTION:.0%} of v5p HBM)"
    )

    # the rule must actually SHARD (catch a silently-replicating rule
    # regression): per-chip must be well under the unsharded total once
    # fsdp×tp > 2, and never below the perfect-sharding lower bound
    total = _total_bytes(state) + _total_bytes(teacher)
    n_model = axes["fsdp"] * axes["tp"]
    lower = total / (axes["data"] * n_model)
    assert per_chip >= lower * 0.99
    if n_model >= 4:
        assert per_chip < total / (n_model / 2), (
            f"sharding rule left {family} state "
            f"{per_chip / 1e9:.1f} GB/chip of {total / 1e9:.1f} GB total — "
            f"fsdp x tp = {n_model} should cut it at least in half"
        )


def test_full_size_state_fits_v5p_pipeline_parallel():
    """PP placement audit: the CogVideoX TDM state on a ('data','pp','fsdp')
    v5p-8 mesh under pp_fsdp_shardings — each stage holds only L/pp layers
    of all four param roles, ZeRO-3-sharded again over fsdp. The stacked
    blocks dominate the tree, so per-chip bytes must land near the
    perfect-sharding bound of the pp×fsdp product."""
    from jax.sharding import NamedSharding

    from tdm_tpu.parallel import pp as ppp

    mesh = AbstractMesh((2, 2, 2), ("data", "pp", "fsdp"))
    state, teacher = _full_state_shapes("cogvideox")

    def rule(tree, m):
        return ppp.pp_fsdp_shardings(tree, m)

    per_chip = _per_chip_state_bytes(state, mesh, rule) + _per_chip_state_bytes(
        teacher, mesh, rule
    )
    budget = V5P_HBM_BYTES * STATE_BUDGET_FRACTION
    assert per_chip < budget
    total = _total_bytes(state) + _total_bytes(teacher)
    # blocks dominate → within 2x of total/(pp*fsdp); and the pp axis must
    # actually cut residency vs fsdp-only on the same device count
    assert per_chip < total / 4 * 2.0, (
        f"pp placement left {per_chip / 1e9:.1f} GB/chip of "
        f"{total / 1e9:.1f} GB total"
    )
    mesh_fsdp_only = AbstractMesh((2, 2, 1), ("data", "fsdp", "tp"))
    per_chip_fsdp2 = _per_chip_state_bytes(
        state, mesh_fsdp_only
    ) + _per_chip_state_bytes(teacher, mesh_fsdp_only)
    assert per_chip < per_chip_fsdp2 * 0.75, (
        f"pp x fsdp {per_chip / 1e9:.1f} GB/chip is not meaningfully below "
        f"fsdp-only {per_chip_fsdp2 / 1e9:.1f} GB/chip"
    )


def test_full_size_state_fits_v5p_pp_tp_fsdp():
    """Triple-composition audit: the CogVideoX TDM state on a
    ('data','pp','fsdp','tp') v5p-8 mesh under pp_tp_fsdp_shardings —
    each stage holds L/pp layers whose kernels are megatron-sharded over
    tp AND ZeRO-3-sharded over fsdp. The model-axis product (pp×fsdp×tp=8)
    must cut per-chip residency near the perfect bound."""
    from tdm_tpu.parallel import pp as ppp

    mesh = AbstractMesh((1, 2, 2, 2), ("data", "pp", "fsdp", "tp"))
    state, teacher = _full_state_shapes("cogvideox")

    def rule(tree, m):
        return ppp.pp_tp_fsdp_shardings(tree, m)

    per_chip = _per_chip_state_bytes(state, mesh, rule) + _per_chip_state_bytes(
        teacher, mesh, rule
    )
    budget = V5P_HBM_BYTES * STATE_BUDGET_FRACTION
    assert per_chip < budget
    total = _total_bytes(state) + _total_bytes(teacher)
    # blocks dominate and every axis must engage: within 2x of the
    # perfect-sharding bound over the 8-way model-axis product
    assert per_chip < total / 8 * 2.0, (
        f"pp x tp x fsdp placement left {per_chip / 1e9:.1f} GB/chip of "
        f"{total / 1e9:.1f} GB total"
    )


def test_audit_reports_realistic_scale():
    """Sanity-pin the magnitudes so the audit itself can't silently go
    shape-blind: full SD3 training state (4 param roles + int8 moments)
    is multi-GB total, and a 2-GB-class denoiser's params are ~GBs."""
    state, teacher = _full_state_shapes("sd3")
    total = _total_bytes(state) + _total_bytes(teacher)
    assert total > 4e9, f"SD3 audit total suspiciously small: {total / 1e9:.2f} GB"
    p_bytes = _total_bytes(teacher)
    assert p_bytes > 1e9


def test_full_size_moe_state_ep_cuts_expert_residency():
    """EP placement audit: a full-size MoE-PixArt (8 experts — expert MLPs
    multiply the block params ~8x over dense) TDM state on a
    ('data','fsdp','ep') v5p-8 mesh under moe.ep_shardings(+ZeRO-3 base).
    The expert stacks dominate the tree, so per-chip residency must land
    near total/(ep) for the expert leaves — i.e. the ep axis genuinely
    cuts HBM, not just relabels it — and the whole state must fit the
    budget."""
    from tdm_tpu.models.moe import ep_shardings
    from tdm_tpu.parallel import mesh as pmesh

    bundle = families.build("pixart", tiny=False, moe_experts=8)
    params = jax.eval_shape(bundle.init_params, jax.random.PRNGKey(0))
    tx = optim.make_optimizer(1e-5, eight_bit=True)
    state = jax.eval_shape(
        lambda p: tdm.init_state(p, p, tx, tx, use_ema=True), params
    )
    mesh = AbstractMesh((2, 2, 2), ("data", "fsdp", "ep"))

    def rule(tree, m):
        return ep_shardings(
            tree, m,
            base_rule=lambda names, shape: pmesh.fsdp_spec(shape, 2),
        )

    per_chip = _per_chip_state_bytes(state, mesh, rule) + _per_chip_state_bytes(
        params, mesh, rule
    )
    budget = V5P_HBM_BYTES * STATE_BUDGET_FRACTION
    assert per_chip < budget, f"{per_chip / 1e9:.1f} GB/chip over budget"
    total = _total_bytes(state) + _total_bytes(params)
    # expert-dominated tree: ep(2) x fsdp(2) must cut residency well below
    # a replicated or fsdp-only layout on the same device count
    assert per_chip < total / 2, (
        f"ep placement left {per_chip / 1e9:.1f} GB/chip of "
        f"{total / 1e9:.1f} GB total — the ep axis isn't cutting residency"
    )
    # and vs an fsdp-only placement of the same tree (no ep axis used),
    # the ep layout must be strictly smaller: the expert dim is sharded
    # ON TOP of the fsdp dim for the dominant leaves
    fsdp_only = _per_chip_state_bytes(
        state, mesh,
        lambda t, m: jax.tree.map(
            lambda l: __import__("jax").sharding.NamedSharding(
                m, pmesh.fsdp_spec(getattr(l, "shape", ()), 2)
            ),
            t,
        ),
    ) + _per_chip_state_bytes(
        params, mesh,
        lambda t, m: jax.tree.map(
            lambda l: __import__("jax").sharding.NamedSharding(
                m, pmesh.fsdp_spec(getattr(l, "shape", ()), 2)
            ),
            t,
        ),
    )
    assert per_chip < 0.7 * fsdp_only, (per_chip, fsdp_only)
