"""Micro-batching request scheduler — production serving over the jitted
K-NFE samplers.

The reference's serving story is single diffusers pipeline calls (the
README recipes, `/root/reference/README.md:48-138`; SURVEY §3.4): one
process, one prompt batch, one call. On TPU the economics are different and
a server should exploit them:

  * the whole 4-NFE loop is ONE compiled program whose throughput peaks at
    a fixed batch (SD3-1024 on the v5e: batch 4 beats batch 8 —
    docs/ENVIRONMENT_NOTES.md #7), and XLA recompiles on ANY shape change —
    so the server pins a single compiled batch size and PADS the tail
    rather than ever presenting a new shape;
  * independent requests coalesce: the batcher waits up to `max_delay_ms`
    after the first request to fill the batch — the classic
    latency/throughput knob of continuous-batching servers;
  * per-request determinism: each request's initial noise comes from its
    OWN seed via the pipelines' `latents=` input, so a result never
    depends on its batch-mates — (prompt, seed) reproduces exactly across
    batch compositions, carrying the reference's fixed-seed contract
    (seeds 8888/317, `README.md:57,98`) into a multi-tenant server.

Works with every family pipeline (they share the `prompt_embeds=` /
`negative_embeds=` / `latents=` call convention) and composes with the
serving meshes: set `pipe.data_parallel_mesh` (batch throughput) or
`pipe.tensor_parallel_mesh` (latency) and `pipe.quant` before wrapping.
Threading contract: only the worker thread CALLS the pipeline (sampler jit
cache is single-threaded); submit threads run `encode_prompt`, whose
component jit cache is locked in DiffusionPipelineBase._jit_component.
The pending queue is bounded (`max_queue`) because each queued row pins
device HBM — overflow raises `Overloaded` (HTTP 429 upstream).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def latent_shape(pipe, call_kwargs: dict) -> tuple[int, ...]:
    """Per-request (leading-1) latent shape for `pipe` at the server's
    pinned resolution — mirrors each family's `__call__` shape math."""
    fam = getattr(pipe, "family", "")
    cfg = getattr(pipe, "transformer", None)
    cfg = cfg.cfg if cfg is not None else pipe.unet.cfg
    ch = getattr(cfg, "in_channels", 4)
    if fam == "cogvideox":
        c = pipe.vae_cfg
        num_frames = call_kwargs.get("num_frames", 49)
        h = call_kwargs.get("height", 480)
        w = call_kwargs.get("width", 720)
        f_lat = 1 + (num_frames - 1) // c.temporal_factor
        return (1, ch, f_lat, h // c.spatial_factor, w // c.spatial_factor)
    h = call_kwargs.get("height", 1024 if fam == "sd3" else 512)
    w = call_kwargs.get("width", 1024 if fam == "sd3" else 512)
    return (1, ch, h // 8, w // 8)


def _to_device(tree, float_dtype=None):
    """Conditioning pytree → DEVICE arrays; floats cast to `float_dtype`
    when given.

    Two tunnel costs die here (docs/ENVIRONMENT_NOTES.md #2): the upload
    happens once per REQUEST on the submit thread (overlapped with the
    collect window) instead of once per batch on the worker's critical
    path, and — for bf16-compute models — bf16 halves the bytes (SD3's
    [1,333,4096] context is 5.4 MB as f32; the f32-per-batch upload
    measured ~1.4 s/batch at batch 4). The bf16 cast is numerically free
    exactly when the denoiser computes in bf16 (its first touch of
    conditioning re-rounds identically), so the caller passes the model's
    own compute dtype and f32 models keep f32 conditioning."""
    def put(x):
        if float_dtype is not None and not isinstance(x, jax.Array):
            # cast on the HOST (ml_dtypes bf16 ndarray) so the upload
            # itself is half-width — device-side cast would ship f32 bytes
            x = np.asarray(x)
            if np.issubdtype(x.dtype, np.floating):
                x = x.astype(float_dtype)
        x = jnp.asarray(x)
        if float_dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(float_dtype)
        return x

    return jax.tree.map(put, tree)


def _tree_nbytes(tree) -> int:
    """Bytes of a device tree in its as-shipped dtype (upload accounting)."""
    return sum(
        int(np.prod(jnp.shape(x))) * jnp.dtype(jnp.result_type(x)).itemsize
        for x in jax.tree.leaves(tree)
    )


def make_cond_fn(
    pipe, embedding_cache: Optional[str] = None
) -> Callable[[str], Any]:
    """prompt → batch-1 conditioning pytree in the pipeline's family format.

    Prefers attached text encoders (`pipe.encode_prompt`); falls back to an
    offline embedding cache (`cli/build_cache` .npz — the cached-embedding
    serving path, SURVEY §2 text-encoder row). Raises if neither is
    available."""
    has_encoders = bool(
        getattr(pipe, "text_encoder", None)
        or getattr(pipe, "text_encoders", None)
    )
    if has_encoders:
        return lambda prompt: pipe.encode_prompt([prompt])
    if embedding_cache is None:
        raise ValueError(
            "pipeline has no text encoders — pass embedding_cache= "
            "(an .npz built with cli/build_cache)"
        )
    from tdm_tpu.data.prompts import EmbeddingCache, pack_family_cond

    cache = EmbeddingCache.load(embedding_cache)
    fam = getattr(pipe, "family", "")

    def lookup(prompt: str):
        try:
            i = cache.prompts.index(prompt)
        except ValueError:
            # the empty prompt is the CFG unconditional branch: build_cache
            # stores it in the dedicated uncond_* fields, not as a prompt
            # row — consult those before declaring the prompt unknown
            # (same fallback cli/generate.py applies)
            if prompt == "" and cache.uncond_embed is not None:
                e = cache.uncond_embed[None].astype(np.float32)
                m = (
                    cache.uncond_mask[None].astype(np.int32)
                    if cache.uncond_mask is not None
                    else np.ones(e.shape[:2], np.int32)
                )
                p = (
                    cache.uncond_pooled[None].astype(np.float32)
                    if cache.uncond_pooled is not None
                    else None
                )
                return pack_family_cond(fam, e, m, p)
            raise KeyError(
                f"prompt {prompt!r} not in the embedding cache — rebuild "
                "with cli/build_cache"
            )
        return pack_family_cond(
            fam,
            cache.embeds[i : i + 1].astype(np.float32),
            cache.masks[i : i + 1].astype(np.int32),
            (
                cache.pooled[i : i + 1].astype(np.float32)
                if cache.pooled is not None
                else None
            ),
        )

    return lookup


@dataclass
class _Pending:
    cond: Any  # batch-1 conditioning pytree
    noise: jnp.ndarray  # [1, ...] device-resident initial latent (own seed)
    uncond: Any = None  # per-request negative conditioning (CFG > 1 only)
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.monotonic)


class Overloaded(RuntimeError):
    """Raised by submit() when the pending queue is full — the HTTP layer
    maps this to 429 so clients back off instead of the daemon dying."""


@dataclass
class ServeStats:
    requests: int = 0
    batches: int = 0
    rows_padded: int = 0
    failures: int = 0
    rejected: int = 0
    # dispatch → readback-complete; under pipelining this INCLUDES time the
    # result waited behind other readbacks (an upper bound on one batch)
    last_batch_latency_s: float = 0.0
    # completion-to-completion interval — the sustained per-batch period
    # when saturated (use min(latency, period) for backoff hints)
    last_batch_period_s: float = 0.0
    # compiled-shape histogram: {bucket_size: batches run at that shape}
    batches_by_shape: dict = field(default_factory=dict)
    # host↔device traffic accounting (the serving-vs-raw-sampler residual
    # is I/O on tunneled transports — these make the claim auditable):
    upload_bytes: int = 0  # conditioning+uncond uploads, as-shipped dtype
    readback_bytes: int = 0  # result readbacks, native (pre-upcast) dtype
    readback_s: float = 0.0  # measured wall time inside np.asarray(result)

    def as_dict(self) -> dict:
        d = dict(self.__dict__)
        # the resolver thread inserts new shape keys concurrently — iterating
        # a growing dict can raise "dictionary changed size during iteration"
        # (a /stats racing the first batch at a new bucket shape would 500);
        # counters are approximate by design, so snapshot-with-retry suffices
        for _ in range(8):
            try:
                shapes = list(self.batches_by_shape.items())
                break
            except RuntimeError:
                continue
        else:  # pragma: no cover - 8 consecutive mutations mid-copy
            shapes = []
        d["batches_by_shape"] = {str(k): v for k, v in sorted(shapes)}
        d["mean_fill"] = (
            round(self.requests / max(1, self.batches), 3)
            if self.batches
            else 0.0
        )
        return d


class MicroBatcher:
    """Collect generation requests into fixed-size pipeline calls.

    Static per server: batch_size, resolution, steps, guidance — everything
    that changes the compiled program. Dynamic per request: prompt
    (conditioning) and seed (initial noise). `submit` returns a
    `concurrent.futures.Future` resolving to this request's [H, W, 3]
    image (or [F, H, W, 3] video / latent row when the pipeline decodes to
    those)."""

    def __init__(
        self,
        pipe,
        *,
        batch_size: int = 4,
        max_delay_ms: float = 50.0,
        call_kwargs: Optional[dict] = None,
        cond_fn: Optional[Callable[[str], Any]] = None,
        embedding_cache: Optional[str] = None,
        negative_prompt: Optional[str] = None,
        max_queue: int = 64,
        batch_buckets: Optional[Sequence[int]] = None,
        readback_dtype: Optional[str] = None,
    ):
        """`batch_buckets`: optional ascending batch sizes to round partial
        batches up to (e.g. (1, 4)): a lone request on an idle server runs
        the batch-1 program (~half the latency, none of the 4× padded
        compute) instead of padding to the full batch. Each bucket is one
        more compiled program — warm them all (server --warmup does).
        Default: only `batch_size` (the single-shape contract). Note:
        results stay deterministic per (prompt, seed, bucket shape), but
        across DIFFERENT bucket shapes they agree only up to XLA's
        shape-dependent fusion envelope — pin one bucket (the default) if
        bit-exact reproduction across traffic levels matters.

        `readback_dtype`: cast results to this dtype ON DEVICE before the
        host readback (e.g. 'bfloat16' halves the downlink bytes of a
        latent-serving daemon; clients get the cast dtype upcast to f32).
        Lossy by one rounding — leave None (native) when bit-exact f32
        results matter. On tunneled transports (docs/ENVIRONMENT_NOTES.md
        #15) the downlink shares bandwidth with conditioning uploads, so
        this buys real throughput, not just latency."""
        self.pipe = pipe
        self.batch_size = int(batch_size)
        if batch_buckets is None:
            self.batch_buckets = (self.batch_size,)
        else:
            bb = sorted({int(b) for b in batch_buckets} | {self.batch_size})
            if bb[0] < 1 or bb[-1] != self.batch_size:
                raise ValueError(
                    f"batch_buckets {batch_buckets} must be in [1, "
                    f"batch_size={self.batch_size}]"
                )
            self.batch_buckets = tuple(bb)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.call_kwargs = dict(call_kwargs or {})
        self.call_kwargs.pop("seed", None)  # per-request, via latents=
        self.cond_fn = cond_fn or make_cond_fn(pipe, embedding_cache)
        self._noise_shape = latent_shape(pipe, self.call_kwargs)
        # server-level negative conditioning, encoded once (CFG > 1 only)
        # conditioning uploads ride the model's compute dtype (see
        # _to_device): bf16-compute denoisers get bf16 conds for free
        denoiser = getattr(pipe, "transformer", None) or getattr(
            pipe, "unet", None
        )
        mdt = getattr(getattr(denoiser, "cfg", None), "dtype", None)
        self._cond_dtype = jnp.bfloat16 if mdt == jnp.bfloat16 else None
        self._uncond = None
        gs = self.call_kwargs.get("guidance_scale", 1.0)
        if gs is not None and gs > 1.0:
            self._uncond = _to_device(
                self.cond_fn(negative_prompt or ""), self._cond_dtype
            )
        self._readback_dtype = (
            jnp.dtype(readback_dtype) if readback_dtype is not None else None
        )
        self.stats = ServeStats()
        # bounded: each pending row pins device HBM (cond + noise, ~4-8 MB
        # for SD3) — an unbounded queue under a request burst would OOM the
        # chip. Full queue → Overloaded → HTTP 429 (clients back off).
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(max_queue)))
        # device results awaiting host readback (see _resolve_loop); the
        # small bound caps in-flight result HBM + pipelining depth
        self._resolve_q: queue.Queue = queue.Queue(maxsize=4)
        self._last_done: Optional[float] = None  # resolver-thread only
        self._closed = threading.Event()
        self._resolver = threading.Thread(
            target=self._resolve_loop, name="tdm-serve-resolver", daemon=True
        )
        self._resolver.start()
        self._worker = threading.Thread(
            target=self._run_loop, name="tdm-serve-batcher", daemon=True
        )
        self._worker.start()

    # ---- client side ----

    def submit(
        self,
        prompt: Optional[str] = None,
        *,
        cond: Any = None,
        negative_prompt: Optional[str] = None,
        seed: int = 0,
    ) -> Future:
        """Enqueue one request. `cond` (a batch-1 family pytree) bypasses
        prompt encoding when the caller already has embeddings.
        `negative_prompt` overrides the server-wide negative conditioning
        for this request (the reference's per-call knob, README.md:56-60);
        it only takes effect when the server runs with guidance_scale > 1
        (matching the pipelines: CFG off ignores negative conditioning)."""
        if self._closed.is_set():
            raise RuntimeError("batcher is closed")
        if self._q.full():
            # reject BEFORE encoding/uploading anything — overload must not
            # cost device work
            self.stats.rejected += 1
            raise Overloaded(
                f"pending queue full ({self._q.maxsize} requests) — retry"
            )
        if cond is None:
            if prompt is None:
                raise ValueError("need prompt or cond")
            cond = self.cond_fn(prompt)
        cond = _to_device(cond, self._cond_dtype)
        self.stats.upload_bytes += _tree_nbytes(cond)
        uncond = None
        if negative_prompt is not None and self._uncond is not None:
            uncond = _to_device(self.cond_fn(negative_prompt), self._cond_dtype)
            self.stats.upload_bytes += _tree_nbytes(uncond)
        # per-request noise from the request's own seed — determinism is
        # independent of batch composition (see module docstring). Stays a
        # DEVICE array: np.asarray here would force a host readback per
        # request plus a re-upload per batch over the ~100 ms-RTT tunnel
        # (docs/ENVIRONMENT_NOTES.md #2)
        noise = jax.random.normal(
            jax.random.PRNGKey(int(seed)), self._noise_shape, jnp.bfloat16
        ).astype(jnp.float32)
        pend = _Pending(cond=cond, noise=noise, uncond=uncond)
        try:
            # non-blocking: the full() pre-check above can race a burst
            self._q.put_nowait(pend)
        except queue.Full:
            self.stats.rejected += 1
            raise Overloaded(
                f"pending queue full ({self._q.maxsize} requests) — retry"
            ) from None
        # close() race: we can pass the _closed check above, then close()
        # runs and the worker finishes its final drain pass BEFORE our put
        # lands — the orphaned future would block its client for the full
        # request timeout. Drain-and-fail here whenever close() has begun
        # (NOT only when the worker thread is already dead: there is a
        # window where the worker finished draining but is_alive() is still
        # True mid-teardown). Both drains are safe concurrently — a queue
        # item goes to exactly one getter, the done() guard makes failure
        # idempotent, and anything the worker's in-flight collect already
        # took is served normally.
        if self._closed.is_set():
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is None:
                    # close()'s wake sentinel: a worker blocked in
                    # _collect's indefinite get() NEEDS it — put it back
                    # (Full ⇒ the queue has items, the worker is awake)
                    try:
                        self._q.put_nowait(None)
                    except queue.Full:
                        pass
                    break
                if not item.future.done():
                    item.future.set_exception(RuntimeError("batcher closed"))
        return pend.future

    def generate(
        self,
        prompt: str,
        *,
        negative_prompt: Optional[str] = None,
        seed: int = 0,
        timeout: float = 600.0,
    ):
        """Blocking convenience wrapper around `submit`."""
        return self.submit(
            prompt, negative_prompt=negative_prompt, seed=seed
        ).result(timeout=timeout)

    def warm(
        self, prompt: str = "", *, cond: Any = None, timeout: float = 3600.0
    ) -> None:
        """Deterministically compile EVERY bucket shape before traffic.

        For each bucket (largest first — its cache entries help the rest),
        enqueue exactly that many pre-built rows in one tight loop. The
        rows share one encoded cond and one noise array, so there is no
        per-row encode/upload between puts and they land microseconds
        apart; the collect window is temporarily widened so the worker
        cannot split them into smaller shapes — unlike concurrent
        submit() calls, which only coalesce if they beat the window."""
        if cond is None:
            cond = self.cond_fn(prompt)
        cond = _to_device(cond, self._cond_dtype)
        noise = jax.random.normal(
            jax.random.PRNGKey(0), self._noise_shape, jnp.bfloat16
        ).astype(jnp.float32)
        old_delay = self.max_delay_s
        self.max_delay_s = max(old_delay, 2.0)
        try:
            for bucket in sorted(self.batch_buckets, reverse=True):
                rows = [
                    _Pending(cond=cond, noise=noise) for _ in range(bucket)
                ]
                for r in rows:
                    self._q.put(r)
                for r in rows:
                    r.future.result(timeout=timeout)
        finally:
            self.max_delay_s = old_delay

    def close(self, *, timeout: float = 30.0) -> None:
        self._closed.set()
        try:
            self._q.put_nowait(None)  # wake the worker
        except queue.Full:
            pass  # queue has items — the worker is awake and will see _closed
        self._worker.join(timeout=timeout)
        if self._worker.is_alive():
            # a batch is still compiling/executing past the timeout — do NOT
            # enqueue the resolver sentinel: it would cut ahead of that
            # batch's results and orphan its futures. Both threads are
            # daemons; the in-flight batch still resolves, and they die
            # with the process.
            return
        try:
            # worker is dead → nothing else will enqueue; bounded put so a
            # resolver wedged on a hung readback can't block close() forever
            self._resolve_q.put(None, timeout=timeout)
        except queue.Full:
            return  # resolver wedged mid-readback; abandon (daemon thread)
        self._resolver.join(timeout=timeout)

    # ---- worker side ----

    def _collect(self) -> list[_Pending]:
        """One batch: block for the first request, then fill until
        batch_size or the collect window closes."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_delay_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            batch.append(item)
        return batch

    def _run_loop(self) -> None:
        while not self._closed.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._run_batch(batch)
            except Exception as e:  # surface to every caller, keep serving
                self.stats.failures += len(batch)
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
        # drain: fail anything still queued after close()
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item.future.done():
                item.future.set_exception(RuntimeError("batcher closed"))

    def _run_batch(self, batch: list[_Pending]) -> None:
        n = len(batch)
        # round up to the smallest allowed bucket; pad the tail by repeating
        # the last row — the compiled program only ever sees the bucket
        # shapes (one by default), so no recompiles; padded outputs drop
        bucket = next(b for b in self.batch_buckets if b >= n)
        pad = bucket - n
        rows = batch + [batch[-1]] * pad
        # all rows are already device-resident (submit side) — concat on
        # device, nothing re-crosses the tunnel on the batch critical path
        cond = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0),
            *[p.cond for p in rows],
        )
        noise = jnp.concatenate([p.noise for p in rows], axis=0)
        uncond = None
        if self._uncond is not None:
            # per-row: the request's own negative conditioning when it sent
            # one, else the server-wide default
            uncond = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[
                    p.uncond if p.uncond is not None else self._uncond
                    for p in rows
                ],
            )
        t0 = time.monotonic()
        out = self.pipe(
            prompt_embeds=cond,
            negative_embeds=uncond,
            latents=noise,
            **self.call_kwargs,
        )
        result = out.images if out.images is not None else out.latents
        if self._readback_dtype is not None:
            # device-side downcast: halves downlink bytes (see __init__)
            result = result.astype(self._readback_dtype)
        # hand the DEVICE result to the resolver thread: the ~0.3 s/batch
        # host readback overlaps the NEXT batch's compute instead of
        # blocking this worker (queue bound caps in-flight device results)
        self._resolve_q.put((batch, result, t0, pad))

    def _resolve_loop(self) -> None:
        while True:
            item = self._resolve_q.get()
            if item is None:
                return
            batch, result_dev, t0, pad = item
            try:
                # read back in the array's NATIVE dtype (bf16 latents cross
                # the tunnel at half the bytes; ml_dtypes handles bf16
                # ndarrays), then upcast host-side — bit-identical to
                # upcasting on device
                t_rb = time.monotonic()
                result = np.asarray(result_dev).astype(np.float32)
                self.stats.readback_s += time.monotonic() - t_rb
                self.stats.readback_bytes += (
                    result_dev.size * result_dev.dtype.itemsize
                )
                now = time.monotonic()
                self.stats.last_batch_latency_s = now - t0
                if self._last_done is not None:
                    self.stats.last_batch_period_s = now - self._last_done
                self._last_done = now
                self.stats.requests += len(batch)
                self.stats.batches += 1
                self.stats.rows_padded += pad
                shape = len(batch) + pad
                self.stats.batches_by_shape[shape] = (
                    self.stats.batches_by_shape.get(shape, 0) + 1
                )
                for i, p in enumerate(batch):
                    p.future.set_result(result[i])
            except Exception as e:  # async execution errors surface HERE
                self.stats.failures += len(batch)
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)
