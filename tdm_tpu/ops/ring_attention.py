"""Ring attention — sequence-parallel fused attention over the device mesh.

The long-context extension flagged in SURVEY.md §5: CogVideoX training at
49 frames (S ≈ 18k tokens) fits one chip through the Pallas flash kernel,
but longer videos / higher resolutions need the SEQUENCE axis sharded. Here
each device holds a contiguous shard of Q/K/V; K/V shards rotate around the
mesh axis via `lax.ppermute` (compiled to an ICI collective-permute) while
each hop's partial attention is accumulated online in max-shifted weight
space. After N hops every query has attended to every key; peak memory is
O(S_loc²) logits per hop (N² smaller than monolithic), and XLA overlaps the
next hop's permute with the current hop's matmuls.

Math. Hop i produces (out_i, m_i, l_i) with p = e^{logits − m_i},
out_i = p·V (unnormalized), l_i = Σp. The exact global softmax output is

    out = (Σ_i out_i e^{m_i}) / (Σ_i l_i e^{m_i})

accumulated stably against the running max M: numerator
N ← N·e^{M−M'} + out_i·e^{m_i−M'}, denominator likewise.

Usage (under shard_map, sequence axis 'sp'):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name='sp'),
        mesh=mesh,
        in_specs=P(None, None, 'sp', None),
        out_specs=P(None, None, 'sp', None),
    )(q, k, v)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _partial_attention(q, k, v, bias, scale):
    """(out_unnormalized, m, l) of local q against one K/V shard."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)  # fully-masked rows stay finite
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out, m, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
    prefix_kv: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    prefix_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full attention over sequence shards. q/k/v: [B, H, S_loc, D] local
    shards (call under shard_map); key_mask: local [B, S_loc] (each
    device's mask travels with its K/V shard). Returns the local output
    shard [B, H, S_loc, D].

    `prefix_kv=(k_p, v_p)`: an extra K/V block that is REPLICATED across
    the axis and must be attended exactly once per query — it seeds the
    online-softmax carry instead of riding the ring. This is the
    text-prepended joint attention of CogVideoX under sequence parallelism:
    video K/V shards rotate, the (small) text block stays local
    (`models/cogvideox.py`, reference `README.md:114-138` video recipe)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # fresh zeros are 'unvarying' under shard_map's manual-axes typing —
    # mark constructed arrays varying; mask-derived bias already varies
    def vary(x):  # pvary is deprecated in favor of pcast
        return jax.lax.pcast(x, axis_name, to="varying")
    if key_mask is not None:
        bias = jnp.where(key_mask.astype(bool), 0.0, -1e30).astype(jnp.float32)
    else:
        bias = vary(jnp.zeros(k.shape[:1] + k.shape[2:3], jnp.float32))

    # remat each hop: without it autodiff saves every hop's [S_loc, S_loc]
    # logits (same total memory as monolithic attention, defeating the
    # point); rematerializing keeps backward memory at one hop's worth
    partial_fn = jax.checkpoint(_partial_attention, static_argnums=(4,))

    def step(_, carry):
        num, den, m_run, kv = carry
        k_i, v_i, bias_i = kv
        out_i, m_i, l_i = partial_fn(q, k_i, v_i, bias_i, scale)
        m_new = jnp.maximum(m_run, m_i)
        w_run = jnp.exp(m_run - m_new)
        w_i = jnp.exp(m_i - m_new)
        num = num * w_run + out_i * w_i
        den = den * w_run + l_i * w_i
        kv_next = jax.lax.ppermute(kv, axis_name, perm)
        return num, den, m_new, kv_next

    b, h, s_loc, d = q.shape
    if prefix_kv is not None:
        # seed the carry with the replicated prefix block's partial result
        # (counted exactly once; the loop only merges the rotating shards)
        k_p, v_p = prefix_kv
        if prefix_mask is not None:
            bias_p = jnp.where(
                prefix_mask.astype(bool), 0.0, -1e30
            ).astype(jnp.float32)
        else:
            bias_p = None
        num0, m0, den0 = partial_fn(q, k_p, v_p, bias_p, scale)
    else:
        num0 = vary(jnp.zeros((b, h, s_loc, d), jnp.float32))
        den0 = vary(jnp.zeros((b, h, s_loc, 1), jnp.float32))
        m0 = vary(jnp.full((b, h, s_loc, 1), -1e30, jnp.float32))
    num, den, m_fin, _ = jax.lax.fori_loop(
        0, n, step, (num0, den0, m0, (k, v, bias))
    )
    out = num / jnp.maximum(den, 1e-30)
    # rows whose keys are masked on EVERY hop never see a finite logit
    # (running max stays ≈ -1e30): output 0, matching the flash kernel's
    # l == 0 handling — not a uniform average of masked V rows
    out = jnp.where(m_fin > -1e29, out, 0.0)
    return out.astype(q.dtype)
