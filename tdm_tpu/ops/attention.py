"""Fused multi-head attention for TPU: Pallas flash kernel + XLA fallback.

TPU-native replacement for the xformers memory-efficient attention CUDA
kernels the reference enables per-model (`src/main.py:177-178,372`, flag
`src/args.py:277-279`) and for torch SDPA inside the diffusers denoisers.

Two implementations behind one entry point `attention(...)`:

  * ``xla``    — plain einsum-softmax-einsum. XLA fuses this well up to
    moderate sequence lengths (PixArt-512: S=1024). O(S²) memory.
  * ``pallas`` — blockwise online-softmax flash attention (Dao et al.) as a
    single Pallas kernel: never materializes the S×S score matrix, streams
    K/V blocks through VMEM, accumulates in fp32. Required for SD3-1024
    (S≈4k) and CogVideoX video (S≈18k) where O(S²) would spill HBM.

Layout: q [B, H, Sq, D], k/v [B, H, Sk, D] — head-major so each (batch,head)
pair is one grid row and blocks are contiguous [S, D] tiles (last dim lane-
aligned after padding D→multiple of 128).

Gradients: both impls are differentiable. The pallas path has a full custom
VJP with Dao-style blockwise BACKWARD kernels (dq and dk/dv passes driven by
the forward's saved logsumexp) — no S×S materialization in either direction,
which is what makes video-length (S≈18k) TRAINING fit in HBM.

Sharding: pallas_call has no SPMD partitioning rule, so a mesh-sharded
batch/head axis would make jit fail at lowering (the reference never hits
this — its xformers kernels live under DDP where each rank sees local
tensors). Both flash directions are therefore registered with
`jax.experimental.custom_partitioning`: batch and head dims partition
freely (each (b,h) pair is an independent grid row), sequence and head_dim
stay replicated. This is what lets the SAME kernel run under the FSDP
train step, data-parallel serving, and tensor-parallel serving meshes
without shard_map plumbing at every call site.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (
    ArrayMapping,
    SdyShardingRule,
    custom_partitioning,
)
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

_NEG_INF = -1e30  # large-negative instead of -inf keeps fp32 arithmetic NaN-free


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    impl: str = "auto",
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, S, D] tensors.

    Args:
      key_mask: optional [B, Sk] — nonzero for real keys, 0 for padding (the
        text attention-mask convention of the reference's T5 conditioning,
        `src/main.py:459-461`). Broadcast over heads and queries.
      scale: defaults to 1/sqrt(D).
      impl: 'auto' (pallas on TPU, xla elsewhere) | 'xla' | 'pallas' |
        'splash' (jax's bundled splash-attention kernel with blocks tuned
        for the SD3-1024 MMDiT shape — measured 9.54 vs 11.04 ms/call at
        B4·H24·S4480·D64 on the v5e. Opt-in only: it has no
        custom_partitioning rule, so it must not be traced under a sharded
        mesh; masked attention and non-TPU backends fall back to 'pallas').
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "auto":
        # measured on v5e: XLA's fused S²-materializing attention wins at
        # short sequences (PixArt S=1024: 100 vs 115 ms/fwd — the flash
        # kernel pads head_dim 72→128, wasting MXU work), while flash is
        # mandatory once the score matrix stops fitting (SD3 S≈4.4k,
        # video S≈18k). Crossover set at S_q·S_k ≈ 2048².
        big = q.shape[2] * k.shape[2] > 2048 * 2048
        impl = "pallas" if (jax.default_backend() == "tpu" and big) else "xla"
    # [B, Sk] float bias: 0 = attend, -1e30 = masked.
    if key_mask is None:
        bias = jnp.zeros((q.shape[0], k.shape[2]), jnp.float32)
    else:
        bias = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
    if impl == "xla":
        return _xla_attention(q, k, v, bias, scale)
    if impl == "splash":
        if key_mask is None and (interpret or jax.default_backend() == "tpu"):
            out = _splash_attention(q, k, v, scale, interpret)
            if out is not None:
                return out
        impl = "pallas"  # masked / unsupported shapes / non-TPU: flash kernel
    if impl == "pallas":
        return _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)
    raise ValueError(f"unknown attention impl {impl!r}")


# ---------------------------------------------------------------------------
# Splash attention (opt-in inference path)
# ---------------------------------------------------------------------------

# Swept at the SD3-1024 MMDiT shape (B4, H24, S4429→pad 4480, D64) on the
# v5e: bq=1120/bkv=896 is the fastest legal config (9.54 ms/call vs 9.67 at
# 896/896, 10.42 at 448/896; larger blocks fail to compile). Our own flash
# kernel's best block config measures 11.04 ms at the same shape — splash's
# fused layouts win ~14% forward-only, which matters because the flash
# custom-call is 53% of SD3 inference device busy (docs/PERF.md).
_SPLASH_BLOCK_Q = 1120
_SPLASH_BLOCK_KV = 896
# Larger q blocks win when they don't add padding: at the CogVideoX shape
# (S=17776 -> pad 17920 either way) bq=1792 measured 42.15 vs 1120's 43.23
# ms/call; at the SD3 shape 1792 would over-pad (4429 -> 5376 vs 4480) so
# 1120 stays. Candidates tried in descending order; first minimal-padding
# one wins.
_SPLASH_BLOCK_Q_CANDIDATES = (1792, 1120)


def _splash_block(seq: int, pref: int) -> int:
    """pref when the sequence is long enough, else one whole padded block
    (splash block sizes must be multiples of 128 and divide the padded
    sequence)."""
    if seq >= pref:
        return pref
    return -(-seq // 128) * 128


def _splash_block_q(sq: int) -> int:
    """Query block: the largest swept candidate that minimizes q padding
    (see _SPLASH_BLOCK_Q_CANDIDATES); short sequences use one padded
    block."""
    if sq < min(_SPLASH_BLOCK_Q_CANDIDATES):
        return _splash_block(sq, _SPLASH_BLOCK_Q)
    best = None
    for cand in _SPLASH_BLOCK_Q_CANDIDATES:
        pad = -(-sq // cand) * cand
        if best is None or pad < best[0]:
            best = (pad, cand)
    return best[1]


@functools.lru_cache(maxsize=16)
def _splash_kernel(heads, sq, sk, interpret):
    """Construct (and cache) a splash MHA kernel for [heads, sq, sk].

    When sk needs block-padding, the kernel is built with a plain FullMask
    and `save_residuals=True` instead of any in-kernel pad masking: the
    padded K/V rows are ZEROS, so every pad key contributes logit 0 /
    value 0 — the softmax NUMERATOR is untouched and only the denominator
    inflates by exactly n_pad·exp(0). The returned logsumexp lets the
    caller undo that with one fused elementwise rescale
    (out / (1 - n_pad·exp(-lse))), which measures faster than both a
    NumpyMask (partial boundary blocks: +1.5 ms at the SD3 shape) and
    SegmentIds (per-block comparisons: +2.4-3.2 ms at the video shape) —
    and unlike a NumpyMask costs O(1) host work instead of an
    O(sq_pad·sk_pad) mask table (321M entries at S=17.8k video shapes).
    Padded QUERY rows attend everything and are sliced off.
    Returns None when the bundled kernel is unavailable.
    """
    try:
        from jax.experimental.pallas.ops.tpu import splash_attention as sa
    except ImportError:
        return None
    bq = _splash_block_q(sq)
    bkv = _splash_block(sk, _SPLASH_BLOCK_KV)
    sq_pad = -(-sq // bq) * bq
    sk_pad = -(-sk // bkv) * bkv
    rescale = sk_pad != sk
    # make_splash_mha device_puts its block-sparse mask tables; attention()
    # is usually called mid-trace, where that would capture TRACERS in the
    # (cached) kernel closure — force eager eval so the closure holds
    # concrete constants valid across traces.
    with jax.ensure_compile_time_eval():
        kernel = sa.make_splash_mha(
            mask=sa.MultiHeadMask([sa.FullMask((sq_pad, sk_pad))] * heads),
            head_shards=1,
            q_seq_shards=1,
            save_residuals=rescale,
            block_sizes=sa.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                # backward blocks are required by BlockSizes, but the
                # rescale path's jax.grad goes through a custom_vjp that
                # recomputes with the in-repo flash kernel (the splash VJP
                # cannot accept a logsumexp cotangent); only the
                # no-padding route differentiates through these.
                block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
                use_fused_bwd_kernel=True,
            ),
            interpret=interpret,
        )
    return kernel, sq_pad, sk_pad, rescale


def _splash_attention(q, k, v, scale, interpret):
    """Unmasked attention via jax's bundled splash kernel (padded + sliced
    back, pad keys corrected via the logsumexp residual — see
    _splash_kernel). Returns None if the kernel can't serve this shape so
    the caller falls back to the in-repo flash kernel."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if d % 128 not in (0, 64):  # swept/validated head dims only
        return None
    made = _splash_kernel(h, sq, sk, interpret)
    if made is None:
        return None
    kernel, sq_pad, sk_pad, rescale = made

    def fwd_math(q, k, v):
        qp = _pad_to(q * jnp.asarray(scale, q.dtype), sq_pad, 2)
        kp = _pad_to(k, sk_pad, 2)
        vp = _pad_to(v, sk_pad, 2)
        if not rescale:
            out = jax.vmap(kernel)(qp, kp, vp)
            return out[:, :, :sq, :].astype(q.dtype)
        out, res = jax.vmap(kernel)(qp, kp, vp)
        lse = jax.tree_util.tree_leaves(res)[0]  # [B, H, sq_pad] f32
        n_pad = sk_pad - sk
        corr = 1.0 / (1.0 - n_pad * jnp.exp(-lse[:, :, :sq, None]))
        return (out[:, :, :sq, :] * corr).astype(q.dtype)

    if rescale:
        # The splash VJP rejects a cotangent on its logsumexp residual
        # ("Higher-order AD not supported"), so the rescale path carries a
        # custom VJP that recomputes through the in-repo flash kernel —
        # identical math, and splash grads were already correctness-only
        # (training pins the flash kernel).
        @jax.custom_vjp
        def f(q, k, v):
            return fwd_math(q, k, v)

        def f_fwd(q, k, v):
            return fwd_math(q, k, v), (q, k, v)

        def f_bwd(saved, dout):
            q, k, v = saved
            _, vjp = jax.vjp(
                lambda q, k, v: attention(
                    q, k, v, scale=scale, impl="pallas", interpret=interpret
                ),
                q, k, v,
            )
            return vjp(dout)

        f.defvjp(f_fwd, f_bwd)
        run = f
    else:
        run = fwd_math
    try:
        return run(q, k, v)
    except Exception as e:  # lowering/shape constraint — fall back, not fail
        global _SPLASH_LAST_ERROR
        _SPLASH_LAST_ERROR = e  # diagnosable: silent at runtime by design
        return None


_SPLASH_LAST_ERROR: Exception | None = None


def _xla_attention(q, k, v, bias, scale):
    dtype = q.dtype
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(dtype), v, preferred_element_type=jnp.float32
    )
    # batch rows with EVERY key masked output 0 (softmax of all -1e30 would
    # be a uniform average of masked V rows) — same convention as the flash
    # and ring kernels, e.g. empty-prompt cross-attention
    valid = jnp.any(bias > -1e29, axis=-1)  # [B]
    return jnp.where(valid[:, None, None, None], out, 0.0).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    bias_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_i, l_i,
    *, scale, with_lse=True
):
    """One (batch·head, q-block, k-block) grid cell of online-softmax
    attention. k is the innermost grid dim, so (acc, m, l) scratch carries
    across k-blocks of the same q-block."""
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_i[:] = jnp.full_like(m_i, _NEG_INF)
        l_i[:] = jnp.zeros_like(l_i)

    q = q_ref[0, 0]  # [block_q, d]
    kb = k_ref[0, 0]  # [block_k, d]
    # q arrives PRE-SCALED (one [S,d] multiply outside beats a per-cell
    # [bq,bk] multiply here); `scale` is retained only in the kernel
    # signature for the backward kernels' shared partial-application style
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]
    s = s + bias_ref[0]  # bias block [1, block_k] broadcasts over q

    m_prev = m_i[:, :1]  # [block_q, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [block_q, block_k]
    l_new = alpha * l_i[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc[:] = acc[:] * alpha + pv
    m_i[:] = jnp.broadcast_to(m_new, m_i.shape)
    l_i[:] = jnp.broadcast_to(l_new, l_i.shape)

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finish():
        # rows that never saw an unmasked key (running max still ≈ -1e30:
        # empty-prompt cross-attention, fully padded keys) output 0 — NOT
        # the uniform average of masked V rows a plain softmax would give
        l = l_i[:, :1]
        m = m_i[:, :1]
        valid = m > -1e29
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = jnp.where(valid, acc[:] / denom, 0.0).astype(o_ref.dtype)
        if with_lse:
            # logsumexp per row for the backward pass; +1e30 sentinel on
            # all-masked rows makes exp(s - lse) = 0 there (no grads leak
            # through masked rows)
            lse = jnp.where(
                valid & (l > 0.0), m + jnp.log(denom), 1e30
            )
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


# Measured per-block efficiency on the v5e (work rate relative to 1024
# blocks; forward sweep at S=17.8k, backward sweep agrees within 5%):
# small blocks pad less but pipeline/revisit overhead dominates — at long S
# a 512 block runs ~38% slower than 1024 despite 3.5% less padded area.
_BLOCK_EFF = {512: 0.62, 640: 0.78, 768: 0.85, 896: 0.90, 1024: 1.0}


def _pick_block(seq_len: int, requested: int) -> int:
    """Cost-model block size: among 128-multiples in [512, requested],
    minimize padded(seq)/efficiency(block) — padded work area weighted by
    the measured per-block rate. Reproduces the swept optimum at both
    benchmark shapes, forward AND backward: SD3 S=4429 → 896 (pad 4480,
    13.9 ms bwd, beats 1024's 15.9) and video S=17.8k → 1024 (10.5 ms fwd,
    beats the pad-minimizing 512 choice by 34%). Pure pad-minimization is
    forward-looking only at short S; pure max-block over-pads there."""
    requested = min(requested, max(128, 1 << (seq_len - 1).bit_length()))
    floor = min(512, requested)
    best, best_cost = requested, None
    for b in range(floor, requested + 1, 128):
        padded = -(-seq_len // b) * b
        eff = _BLOCK_EFF.get(b, min(1.0, 0.62 + (b - 512) * 0.38 / 512))
        cost = padded / eff
        if best_cost is None or cost < best_cost or (
            cost == best_cost and b > best
        ):
            best, best_cost = b, cost
    return best


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_bias(bias, mult):
    """Pad the key-bias axis with -1e30 so padded keys are masked out."""
    pad = (-bias.shape[1]) % mult
    if pad == 0:
        return bias
    return jnp.pad(bias, ((0, 0), (0, pad)), constant_values=_NEG_INF)


def _flash_fwd_kernel_nolse(
    bias_ref, q_ref, k_ref, v_ref, o_ref, acc, m_i, l_i, *, scale
):
    _flash_fwd_kernel(
        bias_ref, q_ref, k_ref, v_ref, o_ref, None, acc, m_i, l_i,
        scale=scale, with_lse=False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret):
    # primal (inference) path skips the logsumexp output — at fp32×128
    # columns it writes 2× the attention output's bytes and only the
    # backward pass reads it
    out, _ = _flash_fwd_res(
        q, k, v, bias, scale, block_q, block_k, interpret, with_lse=False
    )
    return out


def _flash_fwd_res(
    q, k, v, bias, scale, block_q, block_k, interpret, with_lse=True
):
    # pre-scale OUTSIDE the partitioned core so the residual (the backward's
    # bit-identical-logits source) is the exact array the kernel consumed
    q_scaled = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if with_lse:
        out, lse = _fwd_partitioned(
            q_scaled, k, v, bias, block_q, block_k, interpret, True
        )
    else:
        out = _fwd_partitioned(
            q_scaled, k, v, bias, block_q, block_k, interpret, False
        )
        lse = None
    return out, (q_scaled, k, v, bias, out, lse)


def _fwd_core(qs, k, v, bias, block_q, block_k, interpret, with_lse):
    """Flash forward on (already pre-scaled) global-logical arrays; padding
    and slicing stay INSIDE so the custom_partitioning boundary sees clean
    [b,h,sq,d] shapes on both sides. Runs per shard under a mesh (b and h
    partition freely; sq/sk/d replicated — see _fwd_sharding_rule)."""
    b, h, sq, d = qs.shape
    sk = k.shape[2]
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(sk, block_k)

    d_pad = max(128, ((d + 127) // 128) * 128)
    qp = _pad_to(_pad_to(qs, block_q, 2), d_pad, 3)
    kp = _pad_to(_pad_to(k, block_k, 2), d_pad, 3)
    vp = _pad_to(_pad_to(v, block_k, 2), d_pad, 3)
    bias_p = _pad_bias(bias, block_k)
    sq_p, sk_p = qp.shape[2], kp.shape[2]

    grid = (b * h, sq_p // block_q, sk_p // block_k)

    out_spec = pl.BlockSpec(
        (1, 1, block_q, d_pad),
        lambda bh, qi, kj: (bh // h, bh % h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    lse_spec = pl.BlockSpec(
        (1, 1, block_q, 128),
        lambda bh, qi, kj: (bh // h, bh % h, qi, 0),
        memory_space=pltpu.VMEM,
    )
    # q arrives pre-scaled; `scale` is unused in the forward kernels' math
    # (retained in their signature for the backward's partial-application
    # style), so the core doesn't need the value at all
    kernel = (
        functools.partial(_flash_fwd_kernel, scale=1.0)
        if with_lse
        else functools.partial(_flash_fwd_kernel_nolse, scale=1.0)
    )
    # under shard_map (ring-attention hops) out_shape must declare how the
    # result varies over the manual mesh axes; outside shard_map vma is
    # empty → None keeps the custom_partitioning path untouched
    vma = getattr(jax.typeof(qs), "vma", frozenset()) or None
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # bias carried as [B, 1, Sk]: a (1, 1, block_k) block keeps the
            # sublane dim equal to the full array dim (TPU tiling rule)
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bh, qi, kj: (bh // h, 0, kj),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q, d_pad),
                lambda bh, qi, kj: (bh // h, bh % h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda bh, qi, kj: (bh // h, bh % h, kj, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k, d_pad),
                lambda bh, qi, kj: (bh // h, bh % h, kj, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[out_spec, lse_spec] if with_lse else out_spec,
        out_shape=(
            [
                jax.ShapeDtypeStruct((b, h, sq_p, d_pad), qs.dtype, vma=vma),
                jax.ShapeDtypeStruct((b, h, sq_p, 128), jnp.float32, vma=vma),
            ]
            if with_lse
            else jax.ShapeDtypeStruct((b, h, sq_p, d_pad), qs.dtype, vma=vma)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(bias_p[:, None, :], qp, kp, vp)
    if not with_lse:
        return out[:, :, :sq, :d]
    out, lse = out
    # slice BOTH outputs back to logical rows: the residual stays compact in
    # HBM and the partitioning boundary sees canonical shapes (the backward
    # re-pads lse rows with the +1e30 sentinel so padded q rows still
    # contribute zero to dk/dv)
    return out[:, :, :sq, :d], lse[:, :, :sq, :]


def _bh_sharding(mesh, sharding, rank: int):
    """NamedSharding keeping the operand's batch/head axes, everything else
    replicated — the only partitioning the kernels support."""
    spec = tuple(getattr(sharding, "spec", None) or ())
    spec = spec + (None,) * (rank - len(spec))
    keep = spec[: min(2, rank)] + (None,) * (rank - 2)
    return NamedSharding(mesh, P(*keep))


def _fwd_infer_sharding(
    block_q, block_k, interpret, with_lse, mesh, arg_shapes, result_shape
):
    out = _bh_sharding(mesh, arg_shapes[0].sharding, 4)
    return (out, out) if with_lse else out


def _fwd_partition(
    block_q, block_k, interpret, with_lse, mesh, arg_shapes, result_shape
):
    qsh = _bh_sharding(mesh, arg_shapes[0].sharding, 4)
    bias_sh = NamedSharding(mesh, P(qsh.spec[0] if qsh.spec else None))
    arg_shardings = (qsh, qsh, qsh, bias_sh)
    out_shardings = (qsh, qsh) if with_lse else qsh
    impl = functools.partial(
        _fwd_core,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
        with_lse=with_lse,
    )
    return mesh, impl, out_shardings, arg_shardings


def _fwd_sharding_rule(
    block_q, block_k, interpret, with_lse, mesh, value_types, result_types
):
    operands = (
        ArrayMapping("b", "h", "sq", "d"),
        ArrayMapping("b", "h", "sk", "d"),
        ArrayMapping("b", "h", "sk", "d"),
        ArrayMapping("b", "sk"),
    )
    # need_replication factors must be listed in introduction order
    # (Shardy verifier: "indices of special factors must be sorted")
    if with_lse:
        results = (
            ArrayMapping("b", "h", "sq", "d"),
            ArrayMapping("b", "h", "sq", "e"),
        )
        need_rep = ("sq", "d", "sk", "e")
    else:
        results = (ArrayMapping("b", "h", "sq", "d"),)
        need_rep = ("sq", "d", "sk")
    return SdyShardingRule(operands, results, need_replication_factors=need_rep)


_fwd_partitioned = custom_partitioning(_fwd_core, static_argnums=(4, 5, 6, 7))
_fwd_partitioned.def_partition(
    infer_sharding_from_operands=_fwd_infer_sharding,
    partition=_fwd_partition,
    sharding_rule=_fwd_sharding_rule,
)


# ---------------------------------------------------------------------------
# Pallas flash attention (backward) — Dao-style blockwise dq / dk / dv
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
    *, scale
):
    """Grid (b·h, q-block, k-block): accumulate dq over k-blocks.
    dS = P ∘ (dO·Vᵀ − Δ);  dQ = scale · dS·K  with P = exp(S − lse).
    q_ref holds the forward's PRE-SCALED q, so s here is bit-identical to
    the forward logits and p renormalizes exactly against the saved lse."""
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0, 0]  # pre-scaled
    kb = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, :1])
    dp = jax.lax.dot_general(
        do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, :1])
    acc[:] += scale * jax.lax.dot_general(
        ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0, 0] = acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    bias_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, acc_dk, acc_dv, *, scale
):
    """Grid (b·h, k-block, q-block): accumulate dk/dv over q-blocks.
    dV = Pᵀ·dO;  dK = scale·dSᵀ·Q = dSᵀ·Q_scaled (q_ref is the forward's
    pre-scaled q, so the scale factor is already folded in and the logits
    match the forward bit-for-bit)."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    q = q_ref[0, 0]  # pre-scaled
    kb = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias_ref[0]
    p = jnp.exp(s - lse_ref[0, 0][:, :1])  # [block_q, block_k]
    do = do_ref[0, 0]
    acc_dv[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0][:, :1])
    # no extra scale: q is pre-scaled, dK = dSᵀ·(scale·Q)
    acc_dk[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0, 0] = acc_dk[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_dv[:].astype(dv_ref.dtype)


def _flash_bwd(scale, block_q, block_k, interpret, residuals, g):
    # q here is the forward's PRE-SCALED q (see _flash_fwd_res residual
    # note); the kernels fold that into the logits and dk math, while dq
    # still multiplies by `scale` to produce the grad w.r.t. the original q
    qs, k, v, bias, out, lse = residuals
    dq, dk, dv = _bwd_partitioned(
        qs, k, v, bias, out, lse, g, scale, block_q, block_k, interpret
    )
    return dq, dk, dv, jnp.zeros_like(bias)


def _bwd_core(qs, k, v, bias, out, lse, g, scale, block_q, block_k, interpret):
    """Flash backward on global-logical arrays (qs pre-scaled, out/lse the
    forward's SLICED outputs); padding is internal so the partitioning
    boundary sees [b,h,s,d] shapes. b/h partition freely, rest replicated."""
    q = qs
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # _pick_block reruns on the same global (replicated) s — identical
    # choices to the forward's
    block_q = _pick_block(sq, block_q)
    block_k = _pick_block(sk, block_k)
    d_pad = max(128, ((d + 127) // 128) * 128)

    qp = _pad_to(_pad_to(q, block_q, 2), d_pad, 3)
    kp = _pad_to(_pad_to(k, block_k, 2), d_pad, 3)
    vp = _pad_to(_pad_to(v, block_k, 2), d_pad, 3)
    gp = _pad_to(_pad_to(g, block_q, 2), d_pad, 3)
    bias_p = _pad_bias(bias, block_k)[:, None, :]
    sq_p, sk_p = qp.shape[2], kp.shape[2]

    # re-pad lse rows with the +1e30 sentinel: padded q rows then have
    # p = exp(s − 1e30) = 0 and leak nothing into dk/dv
    pad_rows = (-sq) % block_q
    if pad_rows:
        lse = jnp.pad(
            lse, ((0, 0), (0, 0), (0, pad_rows), (0, 0)),
            constant_values=1e30,
        )

    # Δ = rowsum(dO ∘ O) — elementwise, XLA fuses it; broadcast to width 128
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    delta = jnp.broadcast_to(delta, (b, h, sq, 128))
    delta = _pad_to(delta, block_q, 2)

    def spec_bh(bq, bd):
        return pl.BlockSpec(
            (1, 1, bq, bd),
            lambda bh_, i, j: (bh_ // h, bh_ % h, i, 0),
            memory_space=pltpu.VMEM,
        )

    def spec_bh_j(bq, bd):
        return pl.BlockSpec(
            (1, 1, bq, bd),
            lambda bh_, i, j: (bh_ // h, bh_ % h, j, 0),
            memory_space=pltpu.VMEM,
        )

    # out_shape vma: see the forward core — required under shard_map hops
    vma = getattr(jax.typeof(qs), "vma", frozenset()) or None

    # dq: grid (bh, q, k) — q-indexed blocks on i, k-indexed on j
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b * h, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bh_, i, j: (bh_ // h, 0, j),
                memory_space=pltpu.VMEM,
            ),
            spec_bh(block_q, d_pad),  # q
            spec_bh_j(block_k, d_pad),  # k
            spec_bh_j(block_k, d_pad),  # v
            spec_bh(block_q, d_pad),  # do
            spec_bh(block_q, 128),  # lse
            spec_bh(block_q, 128),  # delta
        ],
        out_specs=spec_bh(block_q, d_pad),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d_pad), q.dtype, vma=vma),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
    )(bias_p, qp, kp, vp, gp, lse, delta)

    # dk/dv: grid (bh, k, q) — k-indexed blocks on i, q-indexed on j
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b * h, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bh_, i, j: (bh_ // h, 0, i),
                memory_space=pltpu.VMEM,
            ),
            spec_bh_j(block_q, d_pad),  # q (over j)
            spec_bh(block_k, d_pad),  # k (over i)
            spec_bh(block_k, d_pad),  # v (over i)
            spec_bh_j(block_q, d_pad),  # do (over j)
            spec_bh_j(block_q, 128),  # lse (over j)
            spec_bh_j(block_q, 128),  # delta (over j)
        ],
        out_specs=[
            spec_bh(block_k, d_pad),
            spec_bh(block_k, d_pad),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk_p, d_pad), k.dtype, vma=vma),
            jax.ShapeDtypeStruct((b, h, sk_p, d_pad), v.dtype, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(bias_p, qp, kp, vp, gp, lse, delta)

    return (
        dq[:, :, :sq, :d],
        dk[:, :, :sk, :d],
        dv[:, :, :sk, :d],
    )


def _bwd_infer_sharding(
    scale, block_q, block_k, interpret, mesh, arg_shapes, result_shape
):
    qsh = _bh_sharding(mesh, arg_shapes[0].sharding, 4)
    return (qsh, qsh, qsh)


def _bwd_partition(
    scale, block_q, block_k, interpret, mesh, arg_shapes, result_shape
):
    qsh = _bh_sharding(mesh, arg_shapes[0].sharding, 4)
    bias_sh = NamedSharding(mesh, P(qsh.spec[0] if qsh.spec else None))
    # operands: qs, k, v, bias, out, lse, g
    arg_shardings = (qsh, qsh, qsh, bias_sh, qsh, qsh, qsh)
    out_shardings = (qsh, qsh, qsh)
    impl = functools.partial(
        _bwd_core,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )
    return mesh, impl, out_shardings, arg_shardings


def _bwd_sharding_rule(
    scale, block_q, block_k, interpret, mesh, value_types, result_types
):
    operands = (
        ArrayMapping("b", "h", "sq", "d"),
        ArrayMapping("b", "h", "sk", "d"),
        ArrayMapping("b", "h", "sk", "d"),
        ArrayMapping("b", "sk"),
        ArrayMapping("b", "h", "sq", "d"),
        ArrayMapping("b", "h", "sq", "e"),
        ArrayMapping("b", "h", "sq", "d"),
    )
    results = (
        ArrayMapping("b", "h", "sq", "d"),
        ArrayMapping("b", "h", "sk", "d"),
        ArrayMapping("b", "h", "sk", "d"),
    )
    return SdyShardingRule(
        operands, results, need_replication_factors=("sq", "d", "sk", "e")
    )


_bwd_partitioned = custom_partitioning(_bwd_core, static_argnums=(7, 8, 9, 10))
_bwd_partitioned.def_partition(
    infer_sharding_from_operands=_bwd_infer_sharding,
    partition=_bwd_partition,
    sharding_rule=_bwd_sharding_rule,
)


_flash_attention.defvjp(_flash_fwd_res, _flash_bwd)
