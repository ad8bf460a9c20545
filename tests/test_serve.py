"""Serving subsystem tests (serve/batcher.py, serve/server.py): request
coalescing into ONE fixed-shape compiled call, per-request determinism
independent of batch composition, tail padding, the `latents=` pipeline
escape hatch, and the HTTP daemon end-to-end."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tdm_tpu.models import pixart, t5 as t5_mod, vae as vae_lib
from tdm_tpu.pipelines import PixArtPipeline
from tdm_tpu.serve import MicroBatcher, TDMServer, latent_shape

from tests.test_pipelines import FakeTokenizer


@pytest.fixture(scope="module")
def pipe():
    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    lat = jnp.zeros((1, 4, 16, 16))
    text = jnp.zeros((1, 8, cfg.caption_dim))
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text, mask
    )["params"]
    tcfg = t5_mod.T5Config.tiny()
    enc = t5_mod.T5Encoder(cfg=tcfg)
    tparams = enc.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32), mask
    )["params"]
    vcfg = vae_lib.TAESDConfig(width=8, num_stages=1, blocks_per_stage=1)
    dec = vae_lib.TAESDDecoder(cfg=vcfg)
    vparams = dec.init(jax.random.PRNGKey(2), lat)["params"]
    return PixArtPipeline(
        model, params,
        vae_decoder=dec, vae_params=vparams,
        text_encoder=enc, text_encoder_params=tparams,
        tokenizer=FakeTokenizer(vocab=120), max_text_len=8,
    )


CALL = dict(num_inference_steps=2, height=128, width=128, guidance_scale=1.0)


def test_latents_escape_hatch(pipe):
    """pipe(latents=noise) reproduces pipe(seed=s) exactly — the diffusers
    `latents=` contract the batcher builds on."""
    shape = latent_shape(pipe, CALL)
    noise = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.bfloat16)
    a = pipe(["a cat"], seed=7, **CALL).images
    b = pipe(["a cat"], latents=noise, **CALL).images
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="latents shape"):
        pipe(["a cat"], latents=noise[:, :, :8, :8], **CALL)


def test_batcher_coalesces_and_is_deterministic(pipe):
    calls = []
    orig = type(pipe).__call__

    def counting_call(self, *a, **kw):
        calls.append(kw.get("latents").shape)
        return orig(self, *a, **kw)

    # solo references, one request per call (batch composition A)
    solo = {}
    for seed, prompt in [(0, "a cat"), (1, "a dog"), (2, "a panda")]:
        solo[seed] = np.asarray(pipe([prompt], seed=seed, **CALL).images[0])

    b = MicroBatcher(pipe, batch_size=4, max_delay_ms=2000.0, call_kwargs=CALL)
    try:
        type(pipe).__call__ = counting_call
        # pre-encode so enqueues land inside one collect window even on a
        # loaded CPU box (per-submit T5 encodes would race the window)
        conds = {
            seed: b.cond_fn(prompt)
            for seed, prompt in [(0, "a cat"), (1, "a dog"), (2, "a panda")]
        }
        futs = {
            seed: b.submit(cond=cond, seed=seed)
            for seed, cond in conds.items()
        }
        got = {s: f.result(timeout=120) for s, f in futs.items()}
    finally:
        type(pipe).__call__ = orig
        b.close()

    # ONE batched call, padded 3 → 4 (fixed compiled shape)
    assert len(calls) == 1 and calls[0][0] == 4
    assert b.stats.batches == 1 and b.stats.requests == 3
    assert b.stats.rows_padded == 1
    # I/O accounting (bench.py serve's auditable breakdown reads these):
    # 3 conditioning uploads and one batch readback, both byte-counted
    assert b.stats.upload_bytes > 0
    assert b.stats.readback_bytes > 0 and b.stats.readback_s >= 0.0
    assert "upload_bytes" in b.stats.as_dict()
    # per-request results match the solo calls (batch composition B) to a
    # bf16 fusion envelope — determinism is independent of batch-mates
    for seed, arr in got.items():
        np.testing.assert_allclose(arr, solo[seed], atol=2e-2)


def test_batcher_exceeding_batch_size_splits(pipe):
    b = MicroBatcher(pipe, batch_size=2, max_delay_ms=200.0, call_kwargs=CALL)
    seeds = [9, 9, 1, 2, 3]  # two identical (prompt, seed) requests
    try:
        futs = [b.submit("a cat", seed=s) for s in seeds]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        b.close()
    assert len(outs) == 5
    assert b.stats.requests == 5
    assert b.stats.batches >= 3  # 2+2+1 under any timing
    # identical (prompt, seed) requests give identical results regardless
    # of which batch each landed in
    np.testing.assert_array_equal(outs[0], outs[1])


def test_batcher_per_request_negative_prompt(pipe):
    """Per-request negative prompts ride one coalesced CFG batch: each row
    carries its own uncond (or the server default) and matches a solo
    pipeline call with the same negative embeds."""
    call = dict(CALL, guidance_scale=3.0)
    shape = latent_shape(pipe, call)

    def solo(prompt, negative, seed):
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), shape, jnp.bfloat16
        )
        return np.asarray(
            pipe(
                prompt_embeds=pipe.encode_prompt([prompt]),
                negative_embeds=pipe.encode_prompt([negative]),
                latents=noise,
                **call,
            ).images[0]
        )

    b = MicroBatcher(
        pipe, batch_size=2, max_delay_ms=2000.0, call_kwargs=call,
        negative_prompt="blurry",
    )
    try:
        # pre-encode: both requests must land in one collect window
        c0, c1 = b.cond_fn("a cat"), b.cond_fn("a dog")
        b.cond_fn("ugly")  # pre-compile the encoder for the override below
        f0 = b.submit(cond=c0, seed=0)  # server-wide default negative
        f1 = b.submit(cond=c1, seed=1)
        got0 = f0.result(timeout=120)
        got1 = f1.result(timeout=120)
    finally:
        b.close()
    np.testing.assert_allclose(got0, solo("a cat", "blurry", 0), atol=2e-2)

    # now the per-request override, in a fresh batcher (fresh stats)
    b = MicroBatcher(
        pipe, batch_size=2, max_delay_ms=2000.0, call_kwargs=call,
        negative_prompt="blurry",
    )
    try:
        f0 = b.submit(cond=c0, seed=0)
        f1 = b.submit(cond=c1, negative_prompt="ugly", seed=1)
        mixed0 = f0.result(timeout=120)
        mixed1 = f1.result(timeout=120)
    finally:
        b.close()
    assert b.stats.batches == 1  # both rows shipped in ONE compiled call
    # row 0 (default negative) is unaffected by row 1's override
    np.testing.assert_allclose(mixed0, got0, atol=2e-2)
    np.testing.assert_allclose(mixed1, solo("a dog", "ugly", 1), atol=2e-2)
    # the override actually changed the result vs the default negative
    assert np.abs(mixed1 - got1).max() > 1e-4


def test_batcher_composes_with_dp_mesh(pipe):
    """The batcher's device-resident rows reshard cleanly into a
    data-parallel serving mesh (pipe.data_parallel_mesh): same results as
    single-device serving. Guards the device-side concat path."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    reqs = [(0, "a cat"), (1, "a dog"), (2, "a panda"), (3, "a fox")]

    def serve_all():
        b = MicroBatcher(
            pipe, batch_size=4, max_delay_ms=2000.0, call_kwargs=CALL
        )
        try:
            conds = [(s, b.cond_fn(p)) for s, p in reqs]
            futs = [(s, b.submit(cond=c, seed=s)) for s, c in conds]
            return {s: f.result(timeout=300) for s, f in futs}
        finally:
            b.close()

    base = serve_all()
    pipe.data_parallel_mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    try:
        dp = serve_all()
    finally:
        pipe.data_parallel_mesh = None
    for s in base:
        np.testing.assert_allclose(dp[s], base[s], atol=1e-5)


def test_batcher_buckets_pick_smallest_shape(pipe):
    """batch_buckets: a lone request runs the batch-1 program (no padded
    rows), a pair runs batch-2; results match solo pipeline calls."""
    calls = []
    orig = type(pipe).__call__

    def counting_call(self, *a, **kw):
        calls.append(kw.get("latents").shape[0])
        return orig(self, *a, **kw)

    solo = np.asarray(pipe(["a cat"], seed=3, **CALL).images[0])
    b = MicroBatcher(
        pipe, batch_size=2, max_delay_ms=100.0, call_kwargs=CALL,
        batch_buckets=(1, 2),
    )
    try:
        c = b.cond_fn("a cat")
        type(pipe).__call__ = counting_call
        lone = b.submit(cond=c, seed=3).result(timeout=120)
        f1 = b.submit(cond=c, seed=3)
        f2 = b.submit(cond=c, seed=4)
        pair = f1.result(timeout=120)
        f2.result(timeout=120)
    finally:
        type(pipe).__call__ = orig
        b.close()
    assert calls[0] == 1  # lone request took the batch-1 shape
    assert set(calls[1:]) <= {1, 2}  # pair coalesced (or split under load)
    assert b.stats.rows_padded == 0
    np.testing.assert_allclose(lone, solo, atol=2e-2)
    # same (prompt, seed) across DIFFERENT bucket shapes: deterministic per
    # shape, equal up to the shape-dependent XLA fusion envelope
    np.testing.assert_allclose(lone, pair, atol=2e-2)

    with pytest.raises(ValueError, match="batch_buckets"):
        MicroBatcher(
            pipe, batch_size=2, call_kwargs=CALL, batch_buckets=(3,)
        )

    # warm() compiles EVERY bucket shape deterministically (one batch per
    # shape), even with a collect window too small for submit() coalescing
    b = MicroBatcher(
        pipe, batch_size=2, max_delay_ms=0.1, call_kwargs=CALL,
        batch_buckets=(1, 2),
    )
    try:
        b.warm("a cat")
    finally:
        b.close()
    assert b.stats.batches_by_shape == {1: 1, 2: 1}


def test_batcher_serves_video_pipeline():
    """The video path end to end: latent_shape's CogVideoX branch sizes the
    per-request noise, the batcher returns an [F, H, W, 3] video row, and
    the HTTP encoder would ship it as GIF."""
    from tdm_tpu.models import cogvideox as cog, vae3d
    from tdm_tpu.pipelines import CogVideoXPipeline
    from tdm_tpu.serve.server import _encode_image

    cfg = cog.CogVideoXConfig.tiny()
    model = cog.CogVideoXTransformer3D(cfg=cfg)
    vcfg = vae3d.VAE3DConfig.tiny()
    dec = vae3d.VAE3DDecoder(cfg=vcfg)
    lat = jnp.zeros((1, 16, cfg.sample_frames, cfg.sample_h, cfg.sample_w))
    text = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), text)[
        "params"
    ]
    vparams = dec.init(jax.random.PRNGKey(1), lat)["params"]
    vid_pipe = CogVideoXPipeline(
        model, params, vae_decoder=dec, vae_params=vparams, vae_cfg=vcfg,
        vae_tile=8, vae_tile_overlap=2,
    )
    num_frames = 1 + (cfg.sample_frames - 1) * vcfg.temporal_factor
    call = dict(
        num_inference_steps=2,
        num_frames=num_frames,
        height=cfg.sample_h * vcfg.spatial_factor,
        width=cfg.sample_w * vcfg.spatial_factor,
        guidance_scale=1.0,
    )
    emb = np.asarray(
        jax.random.normal(
            jax.random.PRNGKey(3), (1, cfg.max_text_len, cfg.text_dim)
        )
    )
    b = MicroBatcher(
        vid_pipe, batch_size=2, max_delay_ms=10.0, call_kwargs=call,
        cond_fn=lambda prompt: emb,
    )
    try:
        row = b.submit("a video", seed=8888).result(timeout=300)
    finally:
        b.close()
    assert row.shape == (
        num_frames,
        cfg.sample_h * vcfg.spatial_factor,
        cfg.sample_w * vcfg.spatial_factor,
        3,
    )
    assert np.isfinite(row).all()
    out = _encode_image(row)
    assert out["format"] == "gif" and out["shape"] == list(row.shape)


def test_batcher_overload_rejects(pipe):
    """A full pending queue raises Overloaded (HTTP 429 upstream) BEFORE
    any device work, and counts in stats.rejected."""
    import time

    from tdm_tpu.serve.batcher import Overloaded

    gate = threading.Event()
    orig = type(pipe).__call__

    def blocking_call(self, *a, **kw):
        gate.wait(60)
        return orig(self, *a, **kw)

    b = MicroBatcher(
        pipe, batch_size=1, max_delay_ms=1.0, call_kwargs=CALL, max_queue=1
    )
    c = b.cond_fn("a cat")
    try:
        type(pipe).__call__ = blocking_call
        f1 = b.submit(cond=c, seed=0)  # worker dequeues, blocks in the call
        time.sleep(0.5)
        f2 = b.submit(cond=c, seed=1)  # fills the 1-slot queue
        with pytest.raises(Overloaded, match="queue full"):
            b.submit(cond=c, seed=2)
        assert b.stats.rejected == 1
        gate.set()
        f1.result(timeout=120)
        f2.result(timeout=120)
    finally:
        type(pipe).__call__ = orig
        gate.set()
        b.close()


def test_batcher_cond_error_propagates(pipe):
    def bad_cond(prompt):
        raise KeyError(f"prompt {prompt!r} not in cache")

    b = MicroBatcher(
        pipe, batch_size=2, max_delay_ms=10.0, call_kwargs=CALL,
        cond_fn=bad_cond,
    )
    try:
        with pytest.raises(KeyError, match="not in cache"):
            b.submit("a cat", seed=0)
    finally:
        b.close()


def test_http_server_end_to_end(pipe):
    b = MicroBatcher(pipe, batch_size=2, max_delay_ms=30.0, call_kwargs=CALL)
    server = TDMServer(b, port=0).start()  # ephemeral port
    url = f"http://127.0.0.1:{server.port}"
    try:
        # health
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        # two concurrent generates coalesce into one batch
        results = {}

        def post(seed):
            req = urllib.request.Request(
                f"{url}/generate",
                data=json.dumps({"prompt": "a cat", "seed": seed}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                results[seed] = json.loads(r.read())

        threads = [
            threading.Thread(target=post, args=(s,)) for s in (11, 22)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        assert set(results) == {11, 22}
        for seed, payload in results.items():
            assert payload["format"] == "png"
            assert payload["seed"] == seed
            import base64

            png = base64.b64decode(payload["image"])
            assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # bad request: missing prompt → 400, daemon stays alive
        req = urllib.request.Request(
            f"{url}/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        with urllib.request.urlopen(f"{url}/stats", timeout=30) as r:
            stats = json.loads(r.read())["stats"]
        assert stats["requests"] >= 2

        # Prometheus exposition mirrors the same counters
        with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert f"tdm_serve_requests_total {stats['requests']}" in text
        assert "# TYPE tdm_serve_batches_total counter" in text
        assert "tdm_serve_mean_fill" in text
        assert 'tdm_serve_batches_by_shape_total{shape="2"}' in text
    finally:
        server.close()


def test_cache_served_cfg_uses_uncond_fields(tmp_path):
    """CFG serving from an embedding cache: the empty prompt (server-wide
    negative default) resolves to the cache's dedicated uncond_* fields
    (built by build_cache exactly for this) instead of raising KeyError at
    MicroBatcher startup — advisor round-2 medium finding."""
    from tdm_tpu.data.prompts import EmbeddingCache
    from tdm_tpu.serve.batcher import make_cond_fn

    cfg = pixart.PixArtConfig.tiny()
    model = pixart.PixArtTransformer2D(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
        jnp.zeros((1, 8, cfg.caption_dim)), jnp.ones((1, 8), jnp.int32),
    )["params"]
    bare = PixArtPipeline(model, params)  # NO text encoders, NO vae

    rng = np.random.default_rng(3)
    u_embed = rng.normal(size=(8, cfg.caption_dim)).astype(np.float16)
    cache = EmbeddingCache(
        rng.normal(size=(2, 8, cfg.caption_dim)).astype(np.float16),
        np.ones((2, 8), np.int64),
        ["a cat", "a dog"],
        uncond_embed=u_embed,
        uncond_mask=np.ones((8,), np.int64),
    )
    f = str(tmp_path / "c.npz")
    cache.save(f)

    fn = make_cond_fn(bare, f)
    e, m = fn("")  # previously: KeyError("prompt '' not in the cache")
    np.testing.assert_allclose(e[0], u_embed.astype(np.float32), rtol=1e-3)
    assert m.shape == (1, 8)
    with pytest.raises(KeyError, match="not in the embedding cache"):
        fn("never cached")

    # the original failure mode: guidance_scale > 1 at construction
    mb = MicroBatcher(
        bare, batch_size=2, embedding_cache=f,
        call_kwargs=dict(
            num_inference_steps=1, height=128, width=128, guidance_scale=3.0
        ),
    )
    try:
        out = mb.generate("a cat", seed=1, timeout=300.0)
        assert np.all(np.isfinite(np.asarray(out)))
    finally:
        mb.close()


def test_batcher_readback_dtype_downcast(pipe):
    """readback_dtype='bfloat16': results come back f32 (host upcast) within
    one bf16 rounding of the native path, and the byte accounting halves —
    the serving knob behind bench.py serve's ≥2.0 img/s bf16 number."""
    CALL2 = dict(CALL)
    native = MicroBatcher(pipe, batch_size=1, max_delay_ms=5.0, call_kwargs=CALL2)
    a = native.generate("a cat", seed=3)
    rb_native = native.stats.readback_bytes
    native.close()

    bf16 = MicroBatcher(
        pipe, batch_size=1, max_delay_ms=5.0, call_kwargs=CALL2,
        readback_dtype="bfloat16",
    )
    b = bf16.generate("a cat", seed=3)
    rb_bf16 = bf16.stats.readback_bytes
    bf16.close()

    assert a.dtype == np.float32 and b.dtype == np.float32
    np.testing.assert_allclose(a, b, atol=8e-3)  # one bf16 rounding
    assert rb_bf16 * 2 == rb_native, (rb_bf16, rb_native)
