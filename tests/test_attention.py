"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.ops.attention import attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (1, 2, 128, 128, 64),  # aligned
        (2, 2, 200, 300, 72),  # unaligned seq + PixArt head dim 72
        (1, 1, 64, 120, 40),  # tiny cross-attn (text keys), SD1.5 head dim
    ],
)
def test_flash_matches_xla(b, h, sq, sk, d):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk, s in zip(keys, [sq, sk, sk]))
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="pallas", interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_key_mask():
    b, h, sq, sk, d = 2, 2, 64, 100, 32
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk, s in zip(keys, [sq, sk, sk]))
    # T5-style padding mask: first batch keeps 7 tokens, second keeps all
    mask = jnp.zeros((b, sk), jnp.int32).at[0, :7].set(1).at[1, :].set(1)
    ref = attention(q, k, v, mask, impl="xla")
    out = attention(
        q, k, v, mask, impl="pallas", interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # masked result must equal attention restricted to the visible keys
    ref_trunc = attention(q[:1], k[:1, :, :7], v[:1, :, :7], impl="xla")
    np.testing.assert_allclose(out[:1], ref_trunc, atol=2e-5, rtol=2e-5)


def test_flash_multiblock_accumulation():
    """Sequences spanning several k-blocks exercise the online-softmax carry."""
    b, h, sq, sk, d = 1, 1, 256, 512, 64
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk, s in zip(keys, [sq, sk, sk]))
    ref = attention(q, k, v, impl="xla")
    out = attention(
        q, k, v, impl="pallas", interpret=True, block_q=128, block_k=128
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    b, h, s, d = 1, 2, 128, 64
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand(kk, (b, h, s, d), jnp.bfloat16) for kk in keys)
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="pallas", interpret=True)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2
    )


def test_flash_gradients_match_xla():
    b, h, s, d = 1, 2, 128, 32
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk in keys)

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(attention(q, k, v, impl=impl, interpret=True) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for ga, gb in zip(loss("pallas"), loss("xla")):
        np.testing.assert_allclose(ga, gb, atol=1e-4, rtol=1e-4)


def test_flash_backward_multiblock_masked():
    """Blockwise backward kernels (dq + dk/dv) vs XLA grads across multiple
    q/k blocks, rectangular shapes, ragged key mask, and nonuniform
    upstream cotangent."""
    b, h, sq, sk, d = 2, 2, 300, 260, 40  # forces padding on every axis
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk, s in
               zip(keys[:3], (sq, sk, sk)))
    mask = np.ones((b, sk), np.int32)
    mask[0, 200:] = 0
    mask[1, 64:] = 0
    mask = jnp.asarray(mask)
    g = _rand(keys[3], (b, h, sq, d))

    def grads(impl):
        def f(q, k, v):
            out = attention(
                q, k, v, mask, impl=impl, interpret=True,
                block_q=128, block_k=128,
            )
            return jnp.sum(out * g)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for ga, gb, name in zip(grads("pallas"), grads("xla"), "qkv"):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_all_masked_rows_output_zero_all_impls():
    """A batch row whose every key is masked (empty-prompt cross-attention)
    outputs 0 in BOTH impls — not a uniform average of masked V rows — and
    leaks no gradients."""
    b, h, sq, sk, d = 2, 2, 64, 64, 32
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    q, k, v = (_rand(kk, (b, h, s, d)) for kk, s in zip(keys, [sq, sk, sk]))
    g = _rand(keys[3], (b, h, sq, d))
    mask = jnp.zeros((b, sk), jnp.int32).at[0, :].set(1)  # row 1: all masked

    for impl in ("xla", "pallas"):
        out = attention(q, k, v, mask, impl=impl, interpret=True)
        assert float(jnp.abs(out[1]).max()) == 0.0, impl
        # row 0 unchanged
        ref = attention(q[:1], k[:1], v[:1], impl="xla")
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[0]), atol=2e-5, rtol=2e-5
        )

        def f(q, k, v):
            return jnp.sum(attention(q, k, v, mask, impl=impl, interpret=True) * g)

        dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        for name, grad in (("dq", dq), ("dk", dk), ("dv", dv)):
            assert float(jnp.abs(grad[1]).max()) == 0.0, (impl, name)


def test_pick_block_rule():
    """Cost-model block selection (padded area / measured per-block
    efficiency): reproduces the swept optima — 896 at the SD3 shape, 1024
    at video length (pure pad-minimization picked 512 there, 34% slower);
    floor 512 (128-blocks were a 6x slowdown, caught by the video bench);
    shrinks for short sequences."""
    from tdm_tpu.ops.attention import _pick_block

    assert _pick_block(4429, 1024) == 896  # pads 4480 at 0.90 eff
    assert _pick_block(17776, 1024) == 1024  # swept fwd/bwd optimum
    assert _pick_block(1024, 1024) == 1024  # exact fit
    assert _pick_block(128, 1024) == 128  # short seq shrinks
    assert _pick_block(4096, 1024) == 1024  # exact fit at requested


# ---------------------------------------------------------------------------
# Splash attention (opt-in inference path, ops/attention.py _splash_attention)
# ---------------------------------------------------------------------------


def test_splash_unswept_head_dim_falls_back():
    """impl='splash' with a head dim outside the swept/validated set
    (here PixArt's d=72) must silently route to the flash kernel — the
    opt-in contract is 'never worse than pallas'."""
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (_rand(kk, (1, 2, 192, 72)) for kk in keys)
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="splash", interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    from tdm_tpu.ops.attention import _splash_attention

    assert _splash_attention(q, k, v, 72**-0.5, True) is None


def test_splash_masked_falls_back():
    """key_mask forces the flash kernel (splash path is unmasked-only) —
    masked semantics must be identical to pallas."""
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (_rand(kk, (2, 2, 64, 64)) for kk in keys)
    mask = jnp.array([[1] * 40 + [0] * 24, [1] * 64])
    ref = attention(q, k, v, mask, impl="xla")
    out = attention(q, k, v, mask, impl="splash", interpret=True,
                    block_q=128, block_k=128)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_splash_block_helper():
    from tdm_tpu.ops.attention import _splash_block

    assert _splash_block(4429, 1120) == 1120  # SD3 shape: swept optimum
    assert _splash_block(4429, 896) == 896
    assert _splash_block(333, 1120) == 384  # short seq: one padded block
    assert _splash_block(64, 896) == 128  # floor: lane-aligned minimum


def test_splash_interpret_matches_xla():
    """The real splash path (interpret mode) vs XLA at a padded, unaligned
    shape: exercises the logsumexp-rescale KV-padding route (sk 80 -> pad
    128) and the q-row padding slice (sq 96 -> pad 128)."""
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = _rand(keys[0], (1, 2, 96, 64))
    k = _rand(keys[1], (1, 2, 80, 64))
    v = _rand(keys[2], (1, 2, 80, 64))
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="splash", interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_splash_rescale_heavy_padding_matches_xla():
    """A pad-heavy shape (sk 72 -> pad 128: 44% pad keys) through the
    logsumexp-rescale route — the pad-key correction must stay exact even
    when the pad mass is a large fraction of the softmax denominator, and
    jax.grad must route through the custom VJP (flash-kernel recompute)
    since the splash VJP rejects a logsumexp cotangent."""
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand(keys[0], (1, 2, 112, 64))
    k = _rand(keys[1], (1, 2, 72, 64))
    v = _rand(keys[2], (1, 2, 72, 64))
    ref = attention(q, k, v, impl="xla")
    out = attention(q, k, v, impl="splash", interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(
                attention(q, k, v, impl=impl,
                          interpret=(impl == "splash")) ** 2
            )
        return f

    gr = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss("splash"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)


def test_splash_gradients_match_xla():
    """jax.grad through the splash path (backward blocks are specified for
    correctness — training still pins the flash kernel) vs XLA."""
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(keys[0], (1, 2, 96, 64))
    k = _rand(keys[1], (1, 2, 80, 64))
    v = _rand(keys[2], (1, 2, 80, 64))

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(
                attention(q, k, v, impl=impl,
                          interpret=(impl == "splash")) ** 2
            )
        return f

    gr = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss("splash"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)
