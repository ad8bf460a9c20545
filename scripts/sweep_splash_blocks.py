"""A/B sweep: in-repo flash kernel vs jax-bundled TPU attention kernels at
the SD3-1024 MMDiT inference shape (B4, H24, S=4429→pad 4480, D=64).

This is the sweep behind `ops/attention.py impl='splash'` (round 5): the
flash custom-call is 53% of SD3 inference device busy (docs/PERF.md), our
kernel pads D 64→128 (half the lanes idle), and jax's splash kernel has a
d=64-native layout. Swept results (v5e, 2026-08-20):

    ours pallas (block-swept default)      11.04 ms/call
    jax flash_attention (defaults)         58.36
    splash defaults                        66.57
    splash bq=448  bkv=896                 10.42
    splash bq=640  bkv=896                  9.93
    splash bq=896  bkv=896                  9.67
    splash bq=1120 bkv=896                  9.54   <- shipped config
    splash bq=1120 bkv=896 kv=SEQ_MINOR     (hung / no result)
    splash bq>=2240 or bkv=4480            remote-compile failure (VMEM)
    splash kvc=128 pipelining variants     11.57-13.31 (slower)

Methodology (docs/ENVIRONMENT_NOTES.md #1/#2/#12): N chained calls inside
ONE jit (per-dispatch tunnel RTT would otherwise swamp a ~10 ms kernel),
forced readback sync (block_until_ready does not block on this tunnel),
min over repeats. Run from the repo root on a TPU host:

    python scripts/sweep_splash_blocks.py          # SD3 shape
    python scripts/sweep_splash_blocks.py video    # CogVideoX shape

Video-shape results (B1, H30, S=17776, D=64 — the CogVideoX-2B 49-frame
sampler shape, where the flash custom-call dominates device busy): see the
table printed by a run / docs/PERF.md "splash at the video shape".
Pad-key masking at this shape uses SegmentIds (O(S)) — a NumpyMask would
be a 17920^2 = 321M-entry host array.
"""
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "video":
    B, H, S, D = 1, 30, 17776, 64  # CogVideoX-2B 49f 480x720 (226 text tok)
    SHAPE = "video"
else:
    B, H, S, D = 4, 24, 4480, 64  # 4480 = the padded S every kernel accepts
    SHAPE = "sd3"
N = 20 if SHAPE == "sd3" else 5
q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)


def timeit(name, fn):
    @jax.jit
    def run(q, k, v):
        o = q
        for _ in range(N):
            o = fn(o, k, v)
        return o

    try:
        out = run(q, k, v)
        float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))  # sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(q, k, v)
            float(jnp.sum(out[..., :1, :1].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / N * 1000)
        print(f"{name:40s} {best:7.2f} ms/call", flush=True)
        return best
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    from tdm_tpu.ops.attention import attention as ours

    timeit("ours pallas (block-swept default)", partial(ours, impl="pallas"))
    timeit("ours splash (shipped config)", partial(ours, impl="splash"))

    from jax.experimental.pallas.ops.tpu import splash_attention as sa

    def make_splash(bq, bkv, bkvc=None, segs=False):
        """FullMask splash at the block-padded shape; segs=True additionally
        threads SegmentIds that mask the pad keys (the exact-math variant —
        O(S) vs NumpyMask's O(S^2) host mask table)."""
        sq_pad = -(-S // bq) * bq
        sk_pad = -(-S // bkv) * bkv
        mask = sa.MultiHeadMask(
            [sa.FullMask((sq_pad, sk_pad)) for _ in range(H)]
        )
        kernel = sa.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1,
            block_sizes=sa.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkvc or bkv
            ),
        )
        if segs:
            qs = jnp.ones((sq_pad,), jnp.int32)
            ks = jnp.concatenate(
                [jnp.ones((S,), jnp.int32), jnp.zeros((sk_pad - S,), jnp.int32)]
            )
            seg = sa.SegmentIds(q=qs, kv=ks)

        def pad(x, to):
            return jnp.pad(x, ((0, 0), (0, 0), (0, to - x.shape[2]), (0, 0)))

        def f(q, k, v):
            qp = pad(q * (1.0 / np.sqrt(D)), sq_pad)
            kp, vp = pad(k, sk_pad), pad(v, sk_pad)
            if segs:
                out = jax.vmap(partial(kernel, segment_ids=seg))(qp, kp, vp)
            else:
                out = jax.vmap(kernel)(qp, kp, vp)
            return out[:, :, :S, :].astype(q.dtype)

        return f

    if SHAPE == "video":
        for bq, bkv in ((896, 896), (1120, 896), (1024, 1024), (1792, 896),
                        (1120, 1120), (2048, 1024)):
            timeit(f"splash bq={bq} bkv={bkv}", make_splash(bq, bkv))
            timeit(f"splash bq={bq} bkv={bkv} +segids",
                   make_splash(bq, bkv, segs=True))
        return

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    timeit(
        "jax flash_attention (defaults)",
        lambda q, k, v: fa.flash_attention(
            q, k, v, causal=False, sm_scale=1.0 / np.sqrt(D)
        ),
    )

    for bq in (448, 640, 896, 1120):
        for bkv in (640, 896):
            timeit(f"splash bq={bq} bkv={bkv}", make_splash(bq, bkv))
    # exact-math pad masking via SegmentIds vs the shipped NumpyMask path:
    timeit("splash bq=1120 bkv=896 +segids",
           make_splash(1120, 896, segs=True))


if __name__ == "__main__":
    main()
