"""Training configuration — argparse surface with reference flag parity.

Rebuilds `src/args.py:20-339` (the reference's 50-odd flags) as a dataclass +
argparse pair. Flag names are kept verbatim where the concept survives the
TPU port; flags that only configure the torch/accelerate stack are kept as
accepted-but-reinterpreted (`--mixed_precision` → bf16 toggle,
`--enable_xformers_memory_efficient_attention` → Pallas flash attention
toggle) so reference launch commands keep working. The derived output-dir
suffix encodes cfg/total_steps/Reg/Huber exactly like `src/main.py:75-79`.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass
from typing import Optional


@dataclass
class TrainConfig:
    # model / data (src/args.py:24-66)
    pretrained_model_name_or_path: str = "PixArt-alpha/PixArt-XL-2-512x512"
    revision: Optional[str] = None
    variant: Optional[str] = None
    dataset_name: Optional[str] = "JourneyDB/JourneyDB"
    dataset_config_name: Optional[str] = None
    train_data_dir: Optional[str] = None
    image_column: str = "image"
    caption_column: str = "prompt"  # src/args.py:60-66
    max_train_samples: Optional[int] = None
    cache_dir: Optional[str] = None

    # image geometry (unused in image-free training; parity only)
    resolution: int = 512
    center_crop: bool = False
    random_flip: bool = False
    # video geometry (cogvideox family): pixel frames per clip; 0 = the
    # family default (49, reference README.md:116). Latent frames =
    # 1 + (num_frames-1)/4 — pick so --sp divides them.
    num_frames: int = 0

    # core loop (src/args.py:120-160)
    output_dir: str = "tdm-output"
    seed: Optional[int] = None
    train_batch_size: int = 4
    # epoch accounting kicks in when --max_train_steps is 0/negative (the
    # argparse stand-in for the reference's None): total optimizer steps =
    # num_train_epochs x ceil(batches_per_epoch / accum), matching
    # src/main.py's max_train_steps derivation
    num_train_epochs: int = 100
    max_train_steps: Optional[int] = 10001
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False

    # optimizer / LR (src/args.py:161-231)
    learning_rate: float = 2e-5
    scale_lr: bool = False
    lr_scheduler: str = "cosine_with_restarts"
    lr_warmup_steps: int = 50
    snr_gamma: Optional[float] = None  # parsed-but-unused in reference too
    use_8bit_adam: bool = False  # → bf16 optimizer moments on TPU
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    use_ema: bool = False
    non_ema_revision: Optional[str] = None

    # precision / memory (src/args.py:232-242,277-279)
    # maps to the denoiser's COMPUTE dtype (reference src/main.py:330-338):
    # 'bf16' = MXU-native mixed precision (default), 'no'/'fp32' = full
    # fp32 compute, 'fp16' = rejected at parse (no TPU fp16 — use bf16)
    mixed_precision: Optional[str] = "bf16"
    enable_xformers_memory_efficient_attention: bool = False  # → Pallas flash
    allow_tf32: bool = False  # no-op on TPU (MXU bf16 is the native fast path)
    dataloader_num_workers: int = 0
    local_rank: int = -1

    # logging / hub (src/args.py:243-252,94-119)
    logging_dir: str = "logs"
    report_to: str = "tensorboard"
    tracker_project_name: str = "tdm-tpu"
    push_to_hub: bool = False
    hub_token: Optional[str] = None
    hub_model_id: Optional[str] = None

    # checkpointing (src/args.py:253-276)
    checkpointing_steps: int = 500
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None

    # validation (src/args.py:280-301)
    validation_prompts: tuple = (
        # the fixed grid prompts of src/main.py:424-429
        "a photo of a cat",
        "a photo of a dog",
        "a photo of a panda",
        "a photo of a pikachu",
    )
    validation_epochs: int = 5
    validation_steps: int = 50  # cadence of src/main.py:541-542
    prediction_type: Optional[str] = None

    # TPU extension: devices on the 'fsdp' mesh axis (param/optimizer
    # sharding — the DeepSpeed ZeRO-3 equivalent, src/main.py:141-160;
    # 1 = pure data-parallel, the reference's default topology)
    fsdp: int = 1
    # TPU extension: devices on the 'tp' mesh axis — megatron-style tensor
    # parallelism of the denoiser's attention/FF projections during
    # training (parallel/tp.py; no reference analog — its distributed
    # story stops at DDP+ZeRO-3). Composes with --fsdp: mesh becomes
    # ('data','fsdp','tp')
    tp: int = 1
    # TPU extension: devices on the 'pp' mesh axis — GPipe pipeline
    # parallelism of the scan-stacked layer axis (parallel/pp.py; no
    # reference analog): each stage holds only L/pp layers of weights +
    # optimizer state, microbatched activations rotate via ppermute.
    # pixart/cogvideox; composes with --fsdp AND --tp
    # (('data','pp','fsdp','tp') mesh — both stay automatic inside the pp
    # shard_map, GSPMD inserts the gathers/psums per stage).
    pp: int = 1
    # microbatches per pipeline tick (0 = one per stage). Larger values
    # shrink the (S-1)/(M+S-1) bubble at the cost of smaller per-tick
    # matmuls; must divide the per-data-rank batch.
    pp_microbatches: int = 0
    # TPU extension: devices on the 'ep' mesh axis — expert parallelism for
    # a mixture-of-experts student (models/moe.py; requires
    # --moe_experts > 0, pixart family). Composes with --fsdp:
    # ('data','fsdp','ep') mesh, expert stacks shard over 'ep', everything
    # else ZeRO-3 over 'fsdp'.
    ep: int = 1
    # TPU extension: devices on the 'sp' mesh axis — sequence parallelism
    # for VIDEO distillation (cogvideox only): latent FRAMES shard over
    # 'sp', every block's attention runs as ring attention over ICI
    # (models/cogvideox.py sequence_parallel_apply; reference long-video
    # surface README.md:114-138 is single-GPU memory-bound). Mesh becomes
    # ('data'[,'fsdp'],'sp') — composes with --fsdp (pure ZeRO weight
    # sharding; fsdp devices cooperate on the same rows), exclusive with
    # --tp/--pp/--ep.
    sp: int = 1
    # research extension: distill a mixture-of-experts PixArt student —
    # swaps each block's MLP for a top-k MoE (PixArtConfig.moe_experts).
    # 0 = dense (reference parity). The teacher must share the layout
    # (smoke mode initializes one; real runs need MoE teacher weights).
    moe_experts: int = 0
    moe_top_k: int = 2
    # TPU extension: cap the local devices joining the mesh (0 = all).
    # The accelerate `--num_processes` analog (README.md:160) — handy for
    # pinning a debug run to one chip of a pod (or one virtual device in
    # the CPU test harness, where SPMD compiles are slow)
    max_devices: int = 0

    # TDM-specific (src/args.py:302-328)
    cfg: float = 4.5
    total_steps: int = 900
    num_steps: int = 4
    use_huber: bool = False
    use_separate: bool = False
    use_reg: bool = False
    noise_offset: float = 0.0
    # 'dmd' = intended trajectory-distribution-matching gradient (default);
    # 'instruct' = the demo's shipped teacher-regression term
    loss_mode: str = "dmd"
    # TPU extension: which denoiser family to distill. The reference demo
    # only trains PixArt (src/main.py:168-176); the TDM step is
    # model-agnostic (ε denoise-fn contract), so sd15 / sd3 (flow) /
    # cogvideox (v-pred, video) train through the same jitted step
    # (train/families.py)
    model_family: str = "pixart"
    # extra fake-score updates per student update (DMD2-style ratio)
    critic_updates: int = 1
    # TPU extension: run the step's NO-GRAD denoiser forwards (rollout,
    # teacher probe, frozen-critic probe) through dynamic int8 MXU matmuls
    # (ops/quant.py); gradient paths stay bf16
    quant_forwards: bool = False
    # SD3 only: opt into the masked-mean pooled-conditioning stand-in when
    # the batch carries no real CLIP-L/G pooled vectors. Without this flag
    # a full-size sd3 run on a pooled-less cache ERRORS instead of silently
    # training on fabricated conditioning (tiny smoke mode is always
    # allowed — train/families.py)
    allow_pooled_standin: bool = False
    # rank for the final kohya-LoRA artifact extracted from the trained
    # delta (0 = skip; released TDM artifacts are LoRA, README.md:140-144)
    export_lora_rank: int = 32
    # train ONLY LoRA adapter factors of this rank over the frozen teacher
    # (0 = full-weight training, the demo's mode src/main.py:218-224)
    train_lora_rank: int = 0
    # TPU guardrails/observability (SURVEY.md §5: the reference has none):
    # debug_nans aborts on the first non-finite value inside jit;
    # profile_steps>0 wraps steps 11..11+N in a jax.profiler trace
    debug_nans: bool = False
    profile_steps: int = 0
    # persistent XLA compile cache ('auto' = ~/.cache/tdm_tpu/xla, 'off'
    # disables, anything else is a directory) — resumes/re-runs skip the
    # 1-3 min cold compile (docs/ENVIRONMENT_NOTES.md #3)
    compilation_cache: str = "auto"

    def resolved_output_dir(self) -> str:
        """Suffix encoding like the reference (`src/main.py:75-79`):
        output_dir + _cfg{cfg}_steps{total_steps}[_Reg][_Huber]."""
        d = f"{self.output_dir}_cfg{self.cfg}_steps{self.total_steps}"
        if self.use_reg:
            d += "_Reg"
        if self.use_huber:
            d += "_Huber"
        return d

    def effective_lr(self, n_devices: int) -> float:
        """--scale_lr semantics (`src/main.py:200-203`)."""
        if not self.scale_lr:
            return self.learning_rate
        return (
            self.learning_rate
            * self.gradient_accumulation_steps
            * self.train_batch_size
            * n_devices
        )


def parse_args(argv: Optional[list[str]] = None) -> TrainConfig:
    """CLI → TrainConfig. Every dataclass field becomes `--{name}`; booleans
    are store_true flags (matching the reference's argparse style);
    LOCAL_RANK env merge mirrors `src/args.py:331-333`."""
    parser = argparse.ArgumentParser(description="TDM distillation (TPU)")
    for f in dataclasses.fields(TrainConfig):
        name = f"--{f.name}"
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else f.default_factory()  # type: ignore[misc]
        )
        if f.type in ("bool", bool) or isinstance(default, bool):
            parser.add_argument(name, action="store_true", default=default)
        elif f.name == "validation_prompts":
            parser.add_argument(name, nargs="+", default=list(default))
        else:
            # typed from the default where present; None-default fields get
            # their intended type from the table below (str otherwise)
            none_types = {
                "max_train_samples": int, "checkpoints_total_limit": int,
                "seed": int, "snr_gamma": float, "max_train_steps": int,
            }
            typ = type(default) if default is not None else none_types.get(
                f.name, str
            )
            parser.add_argument(name, type=typ, default=default)
    ns = parser.parse_args(argv)
    cfg = TrainConfig(
        **{
            f.name: (
                tuple(getattr(ns, f.name))
                if f.name == "validation_prompts"
                else getattr(ns, f.name)
            )
            for f in dataclasses.fields(TrainConfig)
        }
    )
    env_rank = int(os.environ.get("LOCAL_RANK", -1))
    if env_rank != -1 and env_rank != cfg.local_rank:
        cfg.local_rank = env_rank
    # dataset sanity check (src/args.py:336-337)
    if cfg.dataset_name is None and cfg.train_data_dir is None:
        raise ValueError("Need either a dataset name or a training folder.")
    if cfg.mixed_precision not in (None, "no", "fp32", "bf16"):
        raise ValueError(
            f"--mixed_precision {cfg.mixed_precision!r} is not supported on "
            "TPU — use 'bf16' (MXU-native; what fp16 recipes should run as) "
            "or 'no'/'fp32'"
        )
    return cfg


def apply_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu tdm-serve ...` actually run on CPU.

    This machine's sitecustomize registers the axon TPU plugin at
    interpreter start and the ambient JAX_PLATFORMS freezes the platform
    choice before user code runs (docs/ENVIRONMENT_NOTES.md #6) — exporting
    the env var alone does NOT take effect (measured: a down tunnel hangs a
    `JAX_PLATFORMS=cpu` process at device init). Re-applying the env value
    to jax.config before first device use restores the standard JAX
    contract. No-op when the variable is unset."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache so daemon restarts and
    resumed runs skip the 1-3 min full-model XLA compile (the tunnel's
    dominant cold-start cost, docs/ENVIRONMENT_NOTES.md #3).

    Resolution order: explicit `path` > $JAX_COMPILATION_CACHE_DIR >
    ~/.cache/tdm_tpu/xla. Returns the directory in use. Safe to call
    before or after the first jit; entries are keyed on HLO + compiler
    version, so a stale cache is never wrong, only cold.
    """
    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "tdm_tpu", "xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took >1s to compile, regardless of entry size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
