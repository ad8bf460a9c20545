"""HTTP serving front-end over the micro-batcher — `tdm-serve`.

A dependency-free (stdlib `http.server`) JSON API wrapping
`serve.batcher.MicroBatcher`, so the 4-NFE TDM students deploy as a
service:

    python -m tdm_tpu.serve.server --model out/pixart_tdm \\
        --embedding_cache cache.npz --batch_size 4 --port 8000

    POST /generate   {"prompt": "...", "seed": 8888,
                      "negative_prompt": "..."}   (optional, CFG > 1 only)
                     → {"image": <base64 PNG>, "shape": [H, W, 3], ...}
                       (video pipelines: {"video": <base64 GIF>})
    GET  /healthz    → {"ok": true, "stats": {...}}
    GET  /stats      → batching counters (requests, batches, mean_fill, ...)
    GET  /metrics    → the same counters in Prometheus text exposition

Concurrent client requests coalesce into fixed-shape batched sampler calls
(one compiled program — see serve/batcher.py for the TPU rationale). The
reference has no serving daemon (its API surface is the diffusers pipeline
call, SURVEY §1 layer D) — this is the production wrapper around that same
contract.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _prometheus_metrics(stats: dict) -> str:
    """ServeStats → Prometheus text exposition (the `/metrics` contract every
    production scraper speaks; stdlib-only like the rest of the daemon)."""
    counters = {
        "requests": "generation requests accepted",
        "batches": "compiled batch dispatches",
        "rows_padded": "padded (wasted) batch rows",
        "failures": "requests failed in the worker",
        "rejected": "requests rejected with 429 (queue full)",
    }
    gauges = {
        "last_batch_latency_s": "dispatch to readback-complete of the last batch",
        "last_batch_period_s": "completion-to-completion interval of the last batch",
        "mean_fill": "mean requests per dispatched batch",
    }
    lines = []
    for name, help_ in counters.items():
        lines += [
            f"# HELP tdm_serve_{name}_total {help_}",
            f"# TYPE tdm_serve_{name}_total counter",
            f"tdm_serve_{name}_total {stats.get(name, 0)}",
        ]
    for name, help_ in gauges.items():
        lines += [
            f"# HELP tdm_serve_{name} {help_}",
            f"# TYPE tdm_serve_{name} gauge",
            f"tdm_serve_{name} {stats.get(name, 0.0)}",
        ]
    lines += [
        "# HELP tdm_serve_batches_by_shape_total batches per compiled bucket size",
        "# TYPE tdm_serve_batches_by_shape_total counter",
    ]
    for shape, count in stats.get("batches_by_shape", {}).items():
        lines.append(
            f'tdm_serve_batches_by_shape_total{{shape="{shape}"}} {count}'
        )
    return "\n".join(lines) + "\n"


def _encode_image(arr: np.ndarray) -> dict:
    """[H,W,3] float in [0,1] → PNG; [F,H,W,3] → GIF (fps 8, the reference's
    export_to_video rate, README.md:135); anything else (a pipeline with no
    VAE attached returns raw latents) → base64 .npy."""
    arr = np.asarray(arr, np.float32)
    if not (arr.ndim in (3, 4) and arr.shape[-1] == 3):
        buf = io.BytesIO()
        np.save(buf, arr)
        return {
            "latents": base64.b64encode(buf.getvalue()).decode(),
            "format": "npy",
            "shape": list(arr.shape),
        }
    from PIL import Image

    arr = np.clip(arr, 0.0, 1.0)
    if arr.ndim == 4:  # video
        frames = [Image.fromarray((f * 255).astype(np.uint8)) for f in arr]
        buf = io.BytesIO()
        frames[0].save(
            buf, format="GIF", save_all=True, append_images=frames[1:],
            duration=125, loop=0,
        )
        return {
            "video": base64.b64encode(buf.getvalue()).decode(),
            "format": "gif",
            "shape": list(arr.shape),
        }
    buf = io.BytesIO()
    Image.fromarray((arr * 255).astype(np.uint8)).save(buf, format="PNG")
    return {
        "image": base64.b64encode(buf.getvalue()).decode(),
        "format": "png",
        "shape": list(arr.shape),
    }


def make_handler(batcher, request_timeout_s: float = 600.0):
    from tdm_tpu.serve.batcher import Overloaded

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; the server object collects stats instead
        def log_message(self, fmt, *args):
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if code == 429:
                # hint: one batch's worth of backoff. Under pipelining the
                # latency stat includes readback queue-wait; the completion
                # interval is the true sustained period — min() picks the
                # honest figure in both the idle and saturated regimes.
                s = batcher.stats
                period = (
                    min(s.last_batch_latency_s, s.last_batch_period_s)
                    if s.last_batch_period_s > 0
                    else s.last_batch_latency_s
                )
                self.send_header("Retry-After", str(max(1, int(period + 0.5))))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/stats"):
                self._json(
                    200, {"ok": True, "stats": batcher.stats.as_dict()}
                )
            elif self.path == "/metrics":
                body = _prometheus_metrics(batcher.stats.as_dict()).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                prompt = req.get("prompt")
                if not prompt:
                    self._json(400, {"error": "missing 'prompt'"})
                    return
                seed = int(req.get("seed", 0))
                fut = batcher.submit(
                    prompt,
                    negative_prompt=req.get("negative_prompt"),
                    seed=seed,
                )
                arr = fut.result(timeout=request_timeout_s)
                out = _encode_image(arr)
                out["seed"] = seed
            except Overloaded as e:
                self._json(429, {"error": str(e), "retry": True})
                return
            except KeyError as e:
                self._json(400, {"error": str(e)})
                return
            except (BrokenPipeError, ConnectionResetError):
                return  # client went away mid-read; nothing to answer
            except Exception as e:  # keep the daemon alive on bad requests
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                # success write OUTSIDE the catch-all: a disconnect mid-write
                # must not trigger a second status line on the half-written
                # response (the old shape sent 500 after a partial 200)
                self._json(200, out)
            except (BrokenPipeError, ConnectionResetError):
                pass

    return Handler


class TDMServer:
    """Owns the HTTP server + batcher pair; `start()` is non-blocking (runs
    the accept loop on a daemon thread), `serve_forever()` blocks."""

    def __init__(
        self,
        batcher,
        host: str = "127.0.0.1",
        port: int = 8000,
        *,
        request_timeout_s: float = 600.0,
    ):
        self.batcher = batcher
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(batcher, request_timeout_s)
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> "TDMServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="tdm-serve-http", daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
        self.batcher.close()


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="pipeline dir, diffusers checkout, or repo id")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=4,
                   help="compiled batch (v5e SD3 sweet spot: 4)")
    p.add_argument("--max_delay_ms", type=float, default=50.0,
                   help="collect window after the first queued request")
    p.add_argument("--num_inference_steps", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--negative_prompt", default=None,
                   help="server-wide negative prompt (CFG > 1 only)")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--flow_shift", type=float, default=None)
    p.add_argument("--lora", default=None)
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--quant", default=None, choices=(None, "int8"),
                   help="int8 denoiser matmuls: +8.7%% denoiser-only but a "
                        "TIE at serve granularity on tunneled boxes (fixed "
                        "VAE/PNG/transport costs dominate) — default bf16; "
                        "see docs/PERF.md 'int8 at serve granularity'")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel serving over N local devices")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel serving over N local devices "
                        "(batch_size must be a multiple of N)")
    p.add_argument("--embedding_cache", default=None,
                   help="offline T5/CLIP cache (.npz) when the pipeline "
                        "has no text encoders attached")
    p.add_argument("--compilation_cache", default="auto",
                   help="persistent XLA compile cache dir so daemon "
                        "restarts skip the cold compile; 'auto' = "
                        "~/.cache/tdm_tpu/xla, 'off' disables")
    p.add_argument("--max_queue", type=int, default=64,
                   help="max pending requests (each pins device HBM); a "
                        "full queue returns HTTP 429")
    p.add_argument("--batch_buckets", default=None,
                   help="comma-separated batch sizes to round partial "
                        "batches up to, e.g. '1,4': lone requests on an "
                        "idle server run the small program (~half the "
                        "latency, no padded compute) at the cost of one "
                        "compile per bucket (all warmed by --warmup)")
    p.add_argument("--readback_dtype", default=None,
                   choices=(None, "bfloat16", "float16"),
                   help="cast results to this dtype on device before the "
                        "host readback (halves downlink bytes for latent "
                        "serving; one rounding lossy — default native)")
    p.add_argument("--warmup", nargs="?", const="", default=None,
                   metavar="PROMPT",
                   help="run one discarded batch before accepting traffic "
                        "so the first request is served at steady-state "
                        "latency; with no PROMPT uses '' (or the first "
                        "cached prompt when serving from --embedding_cache)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import inspect

    from tdm_tpu.utils.config import apply_platform_env

    apply_platform_env()

    from tdm_tpu.pipelines import from_pretrained
    from tdm_tpu.serve.batcher import MicroBatcher
    from tdm_tpu.utils.config import enable_compilation_cache

    if args.compilation_cache != "off":
        enable_compilation_cache(
            None if args.compilation_cache == "auto" else args.compilation_cache
        )

    pipe = from_pretrained(args.model)
    if args.lora:
        pipe.load_lora_weights(args.lora, adapter_name="tdm")
        pipe.set_adapters(["tdm"], [args.lora_scale])
    if args.quant:
        pipe.quant = args.quant
    if args.tp and args.dp:
        raise SystemExit("--tp and --dp are mutually exclusive")
    if args.tp and args.tp > 1:
        import jax

        from tdm_tpu.parallel.tp import make_tp_mesh

        pipe.tensor_parallel_mesh = make_tp_mesh(
            1, args.tp, devices=jax.devices()[: args.tp]
        )
    if args.dp and args.dp > 1:
        import jax
        from jax.sharding import Mesh

        if args.batch_size % args.dp:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be a multiple of "
                f"--dp {args.dp} (the batch shards over the mesh)"
            )
        pipe.data_parallel_mesh = Mesh(
            np.array(jax.devices()[: args.dp]), ("data",)
        )

    accepted = inspect.signature(type(pipe).__call__).parameters
    call = {"num_inference_steps": args.num_inference_steps,
            "guidance_scale": args.guidance_scale}
    for k in ("height", "width", "num_frames", "flow_shift"):
        v = getattr(args, k)
        if v is not None:
            call[k] = v
    call = {k: v for k, v in call.items() if k in accepted}

    buckets = None
    if args.batch_buckets:
        buckets = tuple(int(b) for b in args.batch_buckets.split(","))
        if args.dp and args.dp > 1 and any(b % args.dp for b in buckets):
            raise SystemExit(
                f"--batch_buckets {args.batch_buckets} must all be multiples "
                f"of --dp {args.dp} (each bucket batch shards over the mesh)"
            )
    batcher = MicroBatcher(
        pipe,
        batch_size=args.batch_size,
        max_delay_ms=args.max_delay_ms,
        call_kwargs=call,
        embedding_cache=args.embedding_cache,
        negative_prompt=args.negative_prompt,
        max_queue=args.max_queue,
        batch_buckets=buckets,
        readback_dtype=args.readback_dtype,
    )
    # bind the socket BEFORE the (minutes-long on a cold cache) warmup
    # compile: early clients connect into the listen backlog and are
    # answered as soon as serve_forever starts, instead of racing a
    # connection-refused window for the whole warmup
    server = TDMServer(batcher, args.host, args.port)
    if args.warmup is not None:
        wp = args.warmup
        if not wp and args.embedding_cache:
            # cache-served pipelines can only encode cached prompts
            from tdm_tpu.data.prompts import EmbeddingCache

            wp = EmbeddingCache.load(args.embedding_cache).prompts[0]
        import time as _time

        t0 = _time.monotonic()
        batcher.warm(wp)  # deterministically compiles EVERY bucket shape
        print(
            f"tdm-serve: warmed {len(batcher.batch_buckets)} batch shape(s) "
            f"in {_time.monotonic() - t0:.1f}s"
        )
    print(
        f"tdm-serve: {type(pipe).__name__} on "
        f"http://{args.host}:{server.port} "
        f"(batch {args.batch_size}, window {args.max_delay_ms}ms)"
    )
    # SIGTERM (systemd/k8s stop) takes the same graceful path as Ctrl-C:
    # stop accepting, fail queued requests fast ('batcher closed'), let the
    # in-flight device batch finish, join the worker.
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    try:
        prev = signal.signal(signal.SIGTERM, _term)
    except ValueError:  # embedded caller off the main thread: no handler
        prev = None
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)


if __name__ == "__main__":
    main()
