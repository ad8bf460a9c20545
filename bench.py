"""Headline benchmark: 4-NFE few-step sampling throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current flagship: PixArt-α-512 DiT (the reference's training model) running
the full jitted 4-NFE rollout (4 denoiser forwards + scheduler math fused
into one scan). Baseline for vs_baseline is the BASELINE.json north-star
target of 2 images/sec/chip (stated for SD3-1024 on v5p; reported here
against the same bar until the SD3 MMDiT pipeline lands and takes over as
the benched model).

Run on the real chip (default env — JAX_PLATFORMS=axon). ~30s first compile.
"""

from __future__ import annotations

import json
import time


def bench_pixart_4nfe(batch: int = 8, iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from tdm_tpu.core import sampling, schedules as sched
    from tdm_tpu.models import pixart

    cfg = pixart.PixArtConfig()  # full 0.6B, bf16
    model = pixart.PixArtTransformer2D(cfg=cfg)
    seq = 120
    latent = jnp.zeros((batch, 4, 64, 64), jnp.bfloat16)
    t = jnp.full((batch,), 899.0, jnp.float32)
    text = jnp.zeros((batch, seq, cfg.caption_dim), jnp.bfloat16)
    mask = jnp.ones((batch, seq), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), latent, t, text, mask)[
        "params"
    ]
    # bf16 inference weights (halves HBM + feeds the MXU natively)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    schedule = sched.ddpm_linear()
    grid = sched.fewstep_grid(1000, 4)
    fn = pixart.make_denoise_fn(model, params)

    @jax.jit
    def sample(noise):
        return sampling.sample_fewstep(
            fn, schedule, noise, (text, mask), timestep_grid=grid
        )

    noise = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 4, 64, 64), jnp.bfloat16
    )
    sample(noise).block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sample(noise)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    return {
        "metric": "pixart512_4nfe_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(ips / 2.0, 3),
    }


if __name__ == "__main__":
    print(json.dumps(bench_pixart_4nfe()))
