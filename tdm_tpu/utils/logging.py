"""Metrics, logging, and profiling — the observability subsystem.

Reference surface (SURVEY.md §5): python logging with main/non-main verbosity
split (`src/main.py:100-114`), `--report_to` tensorboard/wandb trackers with
scalar loss logging (`src/main.py:349-350,557`), tqdm progress
(`src/main.py:406-411`). The reference has NO profiler; the TPU plan adds
`jax.profiler` traces as the equivalent of what nsight would be on CUDA.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import jax


def setup_logging(name: str = "tdm_tpu", *, main_process: bool = True) -> logging.Logger:
    """Per-process logger; non-main hosts log warnings only (the
    accelerate `is_local_main_process` split, `src/main.py:100-114`)."""
    logging.basicConfig(
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
        level=logging.INFO if main_process else logging.WARNING,
    )
    return logging.getLogger(name)


class MetricLogger:
    """Scalar tracker: tensorboard (via tensorboardX) and/or a metrics.jsonl
    file. Replaces `accelerator.init_trackers`/`accelerator.log`."""

    def __init__(
        self,
        logdir: str,
        *,
        report_to: str = "tensorboard",
        enabled: bool = True,
    ):
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        self._wandb = None
        if report_to in ("tensorboard", "all"):
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:  # tensorboardX optional
                pass
        if report_to in ("wandb", "all"):
            try:  # wandb optional (reference --report_to wandb)
                import wandb

                self._wandb = wandb
                wandb.init(dir=logdir, project=os.environ.get(
                    "WANDB_PROJECT", "tdm-tpu"))
            except Exception:
                self._wandb = None
        self._comet = None
        if report_to in ("comet_ml", "comet", "all"):
            try:  # comet optional (reference --report_to comet_ml,
                # src/args.py choices; accelerate spells it comet_ml)
                import comet_ml

                self._comet = comet_ml.Experiment(
                    project_name=os.environ.get("COMET_PROJECT", "tdm-tpu")
                )
            except Exception:
                self._comet = None
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def log(self, metrics: dict, step: int) -> None:
        if not self.enabled:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        if self._comet is not None:
            self._comet.log_metrics(scalars, step=step)
        if self._jsonl is not None:
            self._jsonl.write(
                json.dumps({"step": step, "ts": time.time(), **scalars}) + "\n"
            )
            self._jsonl.flush()

    def log_image(self, tag: str, image, step: int) -> None:
        """[H, W, 3] uint8/float grid → every active tracker (the
        validation-grid image logging of `log_validation`, reference
        `src/training.py:85-99` — it fans out to tb AND wandb there)."""
        if not self.enabled:
            return
        import numpy as np

        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        if self._tb is not None:
            self._tb.add_image(tag, arr, step, dataformats="HWC")
        if getattr(self, "_wandb", None) is not None:
            self._wandb.log(
                {tag: self._wandb.Image(arr)}, step=step
            )
        if getattr(self, "_comet", None) is not None:
            self._comet.log_image(arr, name=tag, step=step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if getattr(self, "_comet", None) is not None:
            self._comet.end()
        if self._jsonl is not None:
            self._jsonl.close()


class StepTimer:
    """Wall-clock per-step timing with compile-step exclusion; logs
    steps/sec alongside the loss scalars."""

    def __init__(self):
        self._last = None
        self.ema_s = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None if self._last is None else now - self._last
        self._last = now
        if dt is not None:
            self.ema_s = dt if self.ema_s is None else 0.9 * self.ema_s + 0.1 * dt
        return dt


def profile_steps(logdir: str, fn, n_steps: int = 3):
    """Run `fn()` n times under a jax.profiler trace (xplane dump readable
    by TensorBoard / xprof) — the tracing subsystem the reference lacks
    (SURVEY.md §5 'tracing/profiling: absent')."""
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(n_steps):
            out = fn()
        jax.block_until_ready(out)
    return out
