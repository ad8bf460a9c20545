"""Ring attention vs monolithic attention on the 8-virtual-device mesh —
sequence-parallel correctness incl. ragged masks and gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tdm_tpu.ops.attention import attention
from tdm_tpu.ops.ring_attention import ring_attention


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _run_ring(mesh, q, k, v, mask=None):
    in_specs = [P(None, None, "sp", None)] * 3
    args = [q, k, v]
    if mask is not None:
        in_specs.append(P(None, "sp"))
        args.append(mask)

    fn = shard_map(
        functools.partial(
            lambda q, k, v, m=None: ring_attention(
                q, k, v, axis_name="sp", key_mask=m
            )
        ),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, None, "sp", None),
    )
    return fn(*args)


def test_ring_matches_monolithic():
    mesh = _mesh()
    b, h, s, d = 2, 3, 8 * 16, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)
    ref = attention(q, k, v, impl="xla")
    out = jax.jit(lambda q, k, v: _run_ring(mesh, q, k, v))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_with_ragged_mask():
    mesh = _mesh()
    b, h, s, d = 2, 2, 8 * 8, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)
    mask = np.ones((b, s), np.int32)
    mask[0, 40:] = 0  # crosses shard boundaries
    mask[1, 9:] = 0  # nearly all masked, incl. whole shards
    mask = jnp.asarray(mask)
    ref = attention(q, k, v, mask, impl="xla")
    out = jax.jit(lambda q, k, v, m: _run_ring(mesh, q, k, v, m))(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_fully_masked_rows_are_zero():
    """Rows whose keys are masked on EVERY hop must output 0 — the flash
    kernel's l == 0 convention — not a uniform average of masked V rows
    (e.g. empty-prompt cross-attention)."""
    mesh = _mesh()
    b, h, s, d = 2, 2, 8 * 8, 16
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)
    mask = np.ones((b, s), np.int32)
    mask[1, :] = 0  # batch row 1: every key masked, all hops
    mask = jnp.asarray(mask)
    out = jax.jit(lambda q, k, v, m: _run_ring(mesh, q, k, v, m))(q, k, v, mask)
    flash = attention(q, k, v, mask, impl="pallas", interpret=True)
    assert float(jnp.abs(out[1]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(flash[1]), atol=0, rtol=0
    )
    # unmasked batch row is unaffected
    ref = attention(q[:1], k[:1], v[:1], mask[:1], impl="xla")
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5, rtol=2e-5
    )


def test_ring_gradients():
    mesh = _mesh(4)
    b, h, s, d = 1, 2, 4 * 8, 16
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys[:3])
    g = _rand(keys[3], (b, h, s, d))

    def loss_ring(q, k, v):
        return jnp.sum(_run_ring(mesh, q, k, v) * g)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, impl="xla") * g)

    for ga, gb in zip(
        jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v),
        jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=5e-5, rtol=5e-5
        )


def _run_ring_flash(mesh, q, k, v, mask=None):
    """Flash-kernel hops (interpret mode on CPU) — VERDICT r2 item 2: the
    SP path must run the SAME Pallas kernel the monolithic path uses."""
    in_specs = [P(None, None, "sp", None)] * 3
    args = [q, k, v]
    if mask is not None:
        in_specs.append(P(None, "sp"))
        args.append(mask)

    fn = shard_map(
        functools.partial(
            lambda q, k, v, m=None: ring_attention(
                q, k, v, axis_name="sp", key_mask=m,
                impl="pallas", interpret=True,
            )
        ),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, None, "sp", None),
        # interpret-mode pallas re-evals kernels through the jax HLO
        # interpreter, which rejects mixed-vma dynamic_slice; the compiled
        # Mosaic path (real TPU) never takes that route
        check_vma=False,
    )
    return fn(*args)


def test_ring_flash_matches_monolithic():
    mesh = _mesh()
    b, h, s, d = 2, 3, 8 * 16, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)
    ref = attention(q, k, v, impl="xla")
    out = jax.jit(lambda q, k, v: _run_ring_flash(mesh, q, k, v))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_ring_flash_ragged_mask_and_all_masked_rows():
    mesh = _mesh()
    b, h, s, d = 2, 2, 8 * 8, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)
    mask = np.ones((b, s), np.int32)
    mask[0, 40:] = 0  # crosses shard boundaries
    mask[1, :] = 0  # EVERY key masked: zero-output convention
    mask = jnp.asarray(mask)
    out = jax.jit(
        lambda q, k, v, m: _run_ring_flash(mesh, q, k, v, m)
    )(q, k, v, mask)
    ref = attention(q[:1], k[:1], v[:1], mask[:1], impl="xla")
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5, rtol=2e-5
    )
    assert float(jnp.abs(out[1]).max()) == 0.0


def test_ring_flash_gradients():
    """The ring-of-flash-backward-kernels VJP reproduces monolithic grads:
    dk/dv accumulators ride the rotation home, dq sums across hops."""
    mesh = _mesh(4)
    b, h, s, d = 1, 2, 4 * 8, 16
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys[:3])
    g = _rand(keys[3], (b, h, s, d))
    mask = np.ones((b, s), np.int32)
    mask[0, 25:] = 0  # ragged: exercises the masked-hop backward too
    mask = jnp.asarray(mask)

    def loss_ring(q, k, v):
        return jnp.sum(_run_ring_flash(mesh, q, k, v, mask) * g)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, mask, impl="xla") * g)

    for ga, gb in zip(
        jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v),
        jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=5e-5, rtol=5e-5
        )


def test_ring_flash_prefix_matches_concat():
    """Replicated-prefix seeding (CogVideoX text block) under flash hops:
    forward AND all five grads (incl. the prefix K/V, psum'd by shard_map's
    replicated-input transpose) match monolithic attention over the
    concatenated [prefix; ring] keys."""
    mesh = _mesh(4)
    b, h, s, d, s_p = 1, 2, 4 * 8, 16, 8
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys[:3])
    k_p, v_p = (_rand(kk, (b, h, s_p, d)) for kk in keys[3:5])
    g = _rand(keys[5], (b, h, s, d))

    def ring_fn(q, k, v, k_p, v_p):
        fn = shard_map(
            lambda q, k, v, k_p, v_p: ring_attention(
                q, k, v, axis_name="sp", prefix_kv=(k_p, v_p),
                impl="pallas", interpret=True,
            ),
            mesh=mesh,
            in_specs=(
                P(None, None, "sp", None), P(None, None, "sp", None),
                P(None, None, "sp", None), P(), P(),
            ),
            out_specs=P(None, None, "sp", None),
            check_vma=False,  # see _run_ring_flash
        )
        return fn(q, k, v, k_p, v_p)

    def ref_fn(q, k, v, k_p, v_p):
        return attention(
            q,
            jnp.concatenate([k_p, k], axis=2),
            jnp.concatenate([v_p, v], axis=2),
            impl="xla",
        )

    out = jax.jit(ring_fn)(q, k, v, k_p, v_p)
    ref = ref_fn(q, k, v, k_p, v_p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    args = (q, k, v, k_p, v_p)
    ga = jax.grad(lambda *a: jnp.sum(ring_fn(*a) * g), argnums=(0, 1, 2, 3, 4))(*args)
    gb = jax.grad(lambda *a: jnp.sum(ref_fn(*a) * g), argnums=(0, 1, 2, 3, 4))(*args)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=5e-5, rtol=5e-5
        )


def test_ring_flash_vma_typing_with_reference_cores(monkeypatch):
    """The pallas ring path under check_vma=True (the setting the production
    caller models/cogvideox.py uses) — the flash tests above must disable
    vma tracking because interpret-mode pallas rejects mixed-vma
    dynamic_slice, which leaves _ring_flash's pcast/zero-cotangent typing
    structurally untested. Here the Pallas hop cores are swapped for
    numerically-identical pure-jnp references, so shard_map can typecheck
    every vma annotation in _ring_flash fwd+bwd on CPU while the merge /
    rotation / custom_vjp logic under test is byte-for-byte the real one."""
    from tdm_tpu.ops import attention as attn_mod, ring_attention as ra

    def ref_hop(qs, k, v, bias, block_q, block_k, interpret):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qs.astype(jnp.float32), k.astype(jnp.float32)
        ) + bias[:, None, None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        finite = m > -1e29
        p = jnp.exp(logits - jnp.where(finite, m, 0.0))
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
        ) / jnp.maximum(l, 1e-30)
        lse = jnp.where(finite, m + jnp.log(jnp.maximum(l, 1e-30)), -1e30)
        return jnp.where(finite, out, 0.0), lse

    def ref_bwd_core(qs, k, v, bias, out, lse, g, scale, bq, bk, interpret):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qs.astype(jnp.float32), k.astype(jnp.float32)
        ) + bias[:, None, None, :]
        p = jnp.exp(s - lse[..., :1])
        gf = g.astype(jnp.float32)
        dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
        delta = jnp.sum(gf * out.astype(jnp.float32), -1, keepdims=True)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32))
        ds = p * (dp - delta)
        dq = scale * jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qs.astype(jnp.float32))
        return dq, dk, dv

    monkeypatch.setattr(ra, "_hop_flash", ref_hop)
    monkeypatch.setattr(attn_mod, "_bwd_core", ref_bwd_core)

    mesh = _mesh(4)
    b, h, s, d, s_p = 1, 2, 4 * 8, 16, 8
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys[:3])
    k_p, v_p = (_rand(kk, (b, h, s_p, d)) for kk in keys[3:5])
    g = _rand(keys[5], (b, h, s, d))
    mask = np.ones((b, s), np.int32)
    mask[0, 25:] = 0
    mask = jnp.asarray(mask)

    def ring_fn(q, k, v, k_p, v_p, mask):
        fn = shard_map(
            lambda q, k, v, k_p, v_p, m: ring_attention(
                q, k, v, axis_name="sp", key_mask=m,
                prefix_kv=(k_p, v_p), impl="pallas",
            ),
            mesh=mesh,
            in_specs=(
                P(None, None, "sp", None), P(None, None, "sp", None),
                P(None, None, "sp", None), P(), P(), P(None, "sp"),
            ),
            out_specs=P(None, None, "sp", None),
            # the point: vma tracking ON (default) — the production setting
        )
        return fn(q, k, v, k_p, v_p, mask)

    def ref_fn(q, k, v, k_p, v_p, mask):
        full_mask = jnp.concatenate(
            [jnp.ones((b, s_p), mask.dtype), mask], axis=1
        )
        return attention(
            q,
            jnp.concatenate([k_p, k], axis=2),
            jnp.concatenate([v_p, v], axis=2),
            full_mask,
            impl="xla",
        )

    out = jax.jit(ring_fn)(q, k, v, k_p, v_p, mask)
    ref = ref_fn(q, k, v, k_p, v_p, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, mask) * g)

    for ga, gb in zip(
        jax.grad(loss(ring_fn), argnums=(0, 1, 2, 3, 4))(q, k, v, k_p, v_p),
        jax.grad(loss(ref_fn), argnums=(0, 1, 2, 3, 4))(q, k, v, k_p, v_p),
    ):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=5e-5, rtol=5e-5
        )
