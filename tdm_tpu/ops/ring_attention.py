"""Ring attention — sequence-parallel fused attention over the device mesh.

The long-context extension flagged in SURVEY.md §5: CogVideoX training at
49 frames (S ≈ 18k tokens) fits one chip through the Pallas flash kernel,
but longer videos / higher resolutions need the SEQUENCE axis sharded. Here
each device holds a contiguous shard of Q/K/V; K/V shards rotate around the
mesh axis via `lax.ppermute` (compiled to an ICI collective-permute) while
each hop's partial attention is accumulated online in max-shifted weight
space. After N hops every query has attended to every key; XLA overlaps the
next hop's permute with the current hop's matmuls.

Two per-hop implementations behind `impl=` (mirroring ops/attention.py):

  * ``xla``    — einsum partials; materializes one [S_loc, S_loc] logits
    block per hop (N² smaller than monolithic, still O(S_loc²)).
  * ``pallas`` — each hop runs the SAME flash forward kernel the monolithic
    path uses (`ops/attention._fwd_core`), which returns the hop's
    normalized output + logsumexp; hops merge in lse space. Nothing
    [S_loc, S_loc] is ever materialized, and the long-sequence kernel
    tuning (block cost model, docs/ENVIRONMENT_NOTES.md #8) carries over
    verbatim. The backward is a ring of flash BACKWARD kernels
    (`_bwd_core`) driven by the MERGED global lse: each hop computes that
    K/V shard's (dq, dk, dv) partials exactly as the monolithic backward
    would, with dk/dv accumulators riding the rotation home.

Math (xla path). Hop i produces (out_i, m_i, l_i) with p = e^{logits − m_i},
out_i = p·V (unnormalized), l_i = Σp. The exact global softmax output is

    out = (Σ_i out_i e^{m_i}) / (Σ_i l_i e^{m_i})

accumulated stably against the running max M: numerator
N ← N·e^{M−M'} + out_i·e^{m_i−M'}, denominator likewise.

Math (pallas path). Hop i returns (o_i, lse_i) with o_i already normalized
within the hop; the merge tracks M = max_i lse_i and

    out = Σ_i o_i e^{lse_i − M} / Σ_i e^{lse_i − M},
    lse_global = M + log Σ_i e^{lse_i − M}

and the backward uses dS = P ∘ (dO·Vᵀ − Δ) with P = e^{S − lse_global} per
hop — the identical blockwise math of the monolithic flash VJP.

Usage (under shard_map, sequence axis 'sp'):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name='sp'),
        mesh=mesh,
        in_specs=P(None, None, 'sp', None),
        out_specs=P(None, None, 'sp', None),
    )(q, k, v)
"""

from __future__ import annotations

import functools
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
    impl: str = "auto",
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
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
    (`models/cogvideox.py`, reference `README.md:114-138` video recipe).

    `impl`: 'auto' (flash hops on TPU at long S_loc, einsum hops
    otherwise) | 'xla' | 'pallas' — the same selector as
    `ops.attention.attention`."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "auto":
        # same crossover as ops/attention.py: flash wins once a hop's
        # score block stops fitting the fused-XLA sweet spot
        big = q.shape[2] * k.shape[2] > 2048 * 2048
        impl = "pallas" if (jax.default_backend() == "tpu" and big) else "xla"
    if impl == "pallas":

        def _vary(x):  # replicated/constructed operands → varying, so every
            # pallas hop sees consistent manual-axes typing; identity when
            # vma tracking is off (check_vma=False shard_map — pcast's
            # transpose is a psum that demands a varying cotangent)
            return _vary_like(x, k, axis_name)

        if key_mask is not None:
            bias = jnp.where(
                key_mask.astype(bool), 0.0, -1e30
            ).astype(jnp.float32)
        else:
            bias = _vary(jnp.zeros((k.shape[0], k.shape[2]), jnp.float32))
        has_prefix = prefix_kv is not None
        if has_prefix:
            k_p, v_p = prefix_kv
            if prefix_mask is not None:
                bias_p = jnp.where(
                    prefix_mask.astype(bool), 0.0, -1e30
                ).astype(jnp.float32)
            else:
                bias_p = jnp.zeros((k_p.shape[0], k_p.shape[2]), jnp.float32)
        else:  # unused dummies (cotangents come back as zeros)
            k_p = jnp.zeros(k.shape[:2] + (1, k.shape[3]), k.dtype)
            v_p = jnp.zeros_like(k_p)
            bias_p = jnp.zeros((k.shape[0], 1), jnp.float32)
        k_p, v_p, bias_p = _vary(k_p), _vary(v_p), _vary(bias_p)
        return _ring_flash(
            q, k, v, bias, k_p, v_p, bias_p,
            axis_name, float(scale), has_prefix, block_q, block_k, interpret,
        )
    if impl != "xla":
        raise ValueError(f"unknown ring attention impl {impl!r}")
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


# ---------------------------------------------------------------------------
# Flash-kernel hops: the Pallas forward/backward cores of ops/attention.py
# run per K/V shard, merged across hops in logsumexp space.
# ---------------------------------------------------------------------------


def _vary_like(x, ref, axis_name):
    """pcast `x` to varying over `axis_name` when vma tracking is live
    (`ref` carries the axis); identity otherwise (check_vma=False
    shard_map, where pcast's psum transpose would reject the unvarying
    cotangent)."""
    if axis_name in getattr(jax.typeof(ref), "vma", frozenset()):
        return jax.lax.pcast(x, axis_name, to="varying")
    return x


def _hop_flash(qs, k, v, bias, block_q, block_k, interpret):
    """One hop through the monolithic flash FORWARD kernel → the hop's
    normalized output (f32) and per-row logsumexp [B,H,S,1]. The kernel's
    +1e30 all-masked sentinel is mapped to -1e30 so a fully-masked hop
    merges as zero weight (the backward re-derives the sentinel from the
    MERGED lse)."""
    from tdm_tpu.ops.attention import _fwd_core

    out, lse = _fwd_core(qs, k, v, bias, block_q, block_k, interpret, True)
    lse = lse[..., :1]
    lse = jnp.where(lse >= 1e29, -1e30, lse)
    return out.astype(jnp.float32), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _ring_flash(
    q, k, v, bias, k_p, v_p, bias_p,
    axis_name, scale, has_prefix, block_q, block_k, interpret,
):
    out, _ = _ring_flash_fwd(
        q, k, v, bias, k_p, v_p, bias_p,
        axis_name, scale, has_prefix, block_q, block_k, interpret,
    )
    return out


def _ring_flash_fwd(
    q, k, v, bias, k_p, v_p, bias_p,
    axis_name, scale, has_prefix, block_q, block_k, interpret,
):
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    # pre-scale ONCE like the monolithic path (_flash_fwd_res): every hop's
    # kernel consumes the identical array, so backward logits are
    # bit-identical to forward logits
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)

    def vary(x):
        return _vary_like(x, q, axis_name)

    hop = functools.partial(
        _hop_flash, block_q=block_q, block_k=block_k, interpret=interpret
    )
    if has_prefix:
        # the replicated prefix block seeds the carry (attended exactly
        # once); all n rotating shards then merge in the loop
        num, m_run = hop(qs, k_p, v_p, bias_p)
        kv = (k, v, bias)
        iters = n
    else:
        # seed with the LOCAL shard's hop, then merge the other n-1
        num, m_run = hop(qs, k, v, bias)
        kv = jax.lax.ppermute((k, v, bias), axis_name, perm)
        iters = n - 1
    den = vary(jnp.ones(num.shape[:3] + (1,), jnp.float32))

    def step(_, carry):
        num, den, m_run, kv = carry
        k_i, v_i, bias_i = kv
        o_i, lse_i = hop(qs, k_i, v_i, bias_i)
        m_new = jnp.maximum(m_run, lse_i)
        w_run = jnp.exp(m_run - m_new)
        w_i = jnp.exp(lse_i - m_new)
        num = num * w_run + o_i * w_i
        den = den * w_run + w_i
        return num, den, m_new, jax.lax.ppermute(kv, axis_name, perm)

    num, den, m_fin, _ = jax.lax.fori_loop(
        0, iters, step, (num, den, m_run, kv)
    )
    valid = m_fin > -1e29
    out = jnp.where(valid, num / den, 0.0).astype(q.dtype)
    # merged logsumexp drives the backward kernels; the +1e30 sentinel on
    # never-attending rows makes p = exp(s − lse) = 0 there (no grad leaks),
    # exactly like the monolithic kernel's residual
    lse_g = jnp.where(valid, m_fin + jnp.log(den), 1e30)
    return out, (qs, k, v, bias, k_p, v_p, bias_p, out, lse_g)


def _ring_flash_bwd(
    axis_name, scale, has_prefix, block_q, block_k, interpret, res, g
):
    from tdm_tpu.ops.attention import _bwd_core

    qs, k, v, bias, k_p, v_p, bias_p, out, lse_g = res
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    lse128 = jnp.broadcast_to(lse_g, lse_g.shape[:3] + (128,))

    def vary(x):
        return _vary_like(x, qs, axis_name)

    def hop_bwd(k_i, v_i, bias_i):
        # the monolithic flash backward against the MERGED lse: this hop's
        # keys see the global P = exp(s − lse_g), so summing hop partials
        # reproduces the monolithic (dq, dk, dv) exactly
        return _bwd_core(
            qs, k_i, v_i, bias_i, out, lse128, g,
            scale, block_q, block_k, interpret,
        )

    if has_prefix:
        dq_acc, dk_p, dv_p = hop_bwd(k_p, v_p, bias_p)
        dq_acc = dq_acc.astype(jnp.float32)
        chain = (
            k, v, bias,
            vary(jnp.zeros(k.shape, jnp.float32)),
            vary(jnp.zeros(v.shape, jnp.float32)),
        )
        iters = n
    else:
        dq0, dk0, dv0 = hop_bwd(k, v, bias)
        dq_acc = dq0.astype(jnp.float32)
        # dk/dv accumulators ride the rotation WITH their shard (f32 so n
        # bf16 hop-partials don't round-accumulate) and arrive home after
        # the full cycle
        chain = jax.lax.ppermute(
            (k, v, bias, dk0.astype(jnp.float32), dv0.astype(jnp.float32)),
            axis_name, perm,
        )
        iters = n - 1
        dk_p = jnp.zeros_like(k_p)
        dv_p = jnp.zeros_like(v_p)

    def step(_, carry):
        dq_acc, (k_i, v_i, bias_i, dk_i, dv_i) = carry
        dq_h, dk_h, dv_h = hop_bwd(k_i, v_i, bias_i)
        chain = jax.lax.ppermute(
            (
                k_i, v_i, bias_i,
                dk_i + dk_h.astype(jnp.float32),
                dv_i + dv_h.astype(jnp.float32),
            ),
            axis_name, perm,
        )
        return dq_acc + dq_h.astype(jnp.float32), chain

    dq_acc, (_, _, _, dk, dv) = jax.lax.fori_loop(
        0, iters, step, (dq_acc, chain)
    )
    return (
        dq_acc.astype(qs.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(bias),
        dk_p.astype(k_p.dtype) if has_prefix else jnp.zeros_like(k_p),
        dv_p.astype(v_p.dtype) if has_prefix else jnp.zeros_like(v_p),
        jnp.zeros_like(bias_p),
    )


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)
