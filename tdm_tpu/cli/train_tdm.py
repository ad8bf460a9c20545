"""TDM distillation CLI — the `train_tdm_demo.py` / `src/main.py:main()`
equivalent, TPU-native.

Run:  python -m tdm_tpu.cli.train_tdm --output_dir out --dataset_name ...
Launch semantics: the reference uses `accelerate launch --num_processes=2`
(`README.md:158-162`); on TPU there is nothing to launch — one process per
host, all local devices join the ('data','fsdp') mesh automatically, and the
gradient mean compiles to an ICI psum inside the jitted step.

Pipeline per §3.1 with the §2 defects fixed (see train/tdm.py):
  mesh → schedule tables → student/critic/teacher params → optax → prompt
  data (embedding cache preferred) → jitted train step → loop
  [step → metrics cadence → validation grids @50 → orbax checkpoint @500]
  with `--resume_from_checkpoint latest` restore.
"""

from __future__ import annotations

import os
import signal
import sys
from typing import Optional

import numpy as np


def main(argv: Optional[list[str]] = None) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from tdm_tpu.data import prompts as data_prompts, tokenizer as tok_lib
    from tdm_tpu.models import vae as vae_lib
    from tdm_tpu.parallel import mesh as pmesh
    from tdm_tpu.parallel import tp as ptp
    from tdm_tpu.train import families, optim as topt, tdm, validation
    from tdm_tpu.utils import checkpoint as ckpt_lib, config as cfg_lib, logging as log_lib

    cfg_lib.apply_platform_env()
    cfg = cfg_lib.parse_args(argv)
    if pmesh.maybe_initialize_distributed():
        pass  # multi-host runtime up; process_index/count now reflect the pod
    if cfg.compilation_cache != "off":
        cfg_lib.enable_compilation_cache(
            None if cfg.compilation_cache == "auto" else cfg.compilation_cache
        )
    if cfg.debug_nans:
        # the jax_debug_nans guardrail (SURVEY.md §5 'race detection' TPU
        # equivalent — esp. the transport-NaN class of bugs, §2 defect 6)
        jax.config.update("jax_debug_nans", True)
    out_dir = cfg.resolved_output_dir()
    main_process = jax.process_index() == 0
    logger = log_lib.setup_logging(main_process=main_process)
    logger.info("config: %s", cfg)
    logger.info("devices: %s", jax.devices())

    # ---- mesh: ('data', 'fsdp') — default all-data-parallel (the
    # reference topology); --fsdp N shards params/optimizer over N
    # ICI-adjacent devices (ZeRO-3 equivalent) ----
    devices = jax.devices()
    if cfg.max_devices > 0:
        if jax.process_count() > 1:
            # jax.devices() is GLOBAL: slicing it under multi-process
            # would strip other processes' devices from the mesh and
            # deadlock put_batch — the cap is a single-process debug knob
            raise ValueError(
                "--max_devices is only supported in single-process runs"
            )
        devices = devices[: cfg.max_devices]
    n_dev = len(devices)
    n_ep = max(cfg.ep, 1)
    if n_ep > 1:
        if cfg.moe_experts <= 0:
            raise ValueError("--ep requires --moe_experts > 0")
        if cfg.tp > 1 or cfg.pp > 1:
            raise ValueError(
                "--ep composes with --fsdp only (tp/pp x ep is unsupported)"
            )
        if cfg.moe_experts % n_ep:
            raise ValueError(
                f"--moe_experts {cfg.moe_experts} not divisible by "
                f"--ep {n_ep}"
            )
    n_sp = max(cfg.sp, 1)
    if n_sp > 1:
        if cfg.model_family != "cogvideox":
            raise ValueError(
                "--sp (frame-sharded sequence parallelism) supports "
                "--model_family cogvideox only"
            )
        if cfg.tp > 1 or cfg.pp > 1 or n_ep > 1:
            raise ValueError(
                "--sp composes with --fsdp only (tp/pp/ep x sp is "
                "unsupported)"
            )
        if cfg.quant_forwards:
            raise ValueError("--sp with --quant_forwards is not supported")
    n_model = max(cfg.fsdp, 1) * max(cfg.tp, 1) * max(cfg.pp, 1) * n_ep * n_sp
    if n_dev % n_model != 0:
        raise ValueError(
            f"--fsdp {cfg.fsdp} x --tp {cfg.tp} x --pp {cfg.pp} x --ep "
            f"{cfg.ep} x --sp {cfg.sp} does not divide {n_dev} devices"
        )
    # multi-slice pods: group devices slice-major so every model axis
    # (fsdp/tp/pp) stays inside one ICI slice and only the data axis's
    # once-per-step gradient psum crosses DCN (hybrid ICI x DCN layout;
    # no-op on single-slice hardware and CPU meshes)
    devices = pmesh.dcn_ordered_devices(devices, inner=n_model)
    if cfg.pp > 1:
        # GPipe pipeline parallelism over the scan-stacked layer axis
        # (parallel/pp.py): each stage holds L/pp layers of student +
        # critic + teacher weights AND optimizer state. Depth-scaling
        # extension — no reference analog (its distributed story stops at
        # DDP+ZeRO-3, src/main.py:141-160,321-323). Composes with --fsdp
        # and --tp: both stay AUTOMATIC in the pp shard_map, so each
        # stage's layer slice is megatron-sharded over 'tp' and
        # ZeRO-3-sharded over 'fsdp' with GSPMD-inserted psums/gathers
        # (('data','pp','fsdp','tp') mesh — tp innermost: its per-layer
        # psums are latency-critical; pp's one ppermute/tick is light).
        from jax.sharding import Mesh

        if cfg.model_family not in ("pixart", "cogvideox"):
            raise ValueError(
                "--pp currently supports --model_family pixart/cogvideox"
            )
        if cfg.quant_forwards:
            raise ValueError("--pp with --quant_forwards is not supported")
        from tdm_tpu.parallel import pp as ppp

        n_fsdp, n_tp = max(cfg.fsdp, 1), max(cfg.tp, 1)
        mesh = Mesh(
            np.asarray(devices).reshape(
                n_dev // (cfg.pp * n_fsdp * n_tp), cfg.pp, n_fsdp, n_tp
            ),
            (pmesh.DATA_AXIS, ppp.PP_AXIS, pmesh.FSDP_AXIS, ptp.TP_AXIS),
        )
    elif n_ep > 1:
        # expert parallelism (models/moe.py): the MoE student's expert
        # stacks shard over 'ep' by GSPMD annotation (all-to-alls
        # compiler-inserted); everything else ZeRO-3 over 'fsdp'. Research
        # extension — the reference's zoo is dense-only.
        from jax.sharding import Mesh

        n_fsdp = max(cfg.fsdp, 1)
        mesh = Mesh(
            np.asarray(devices).reshape(
                n_dev // (n_fsdp * n_ep), n_fsdp, n_ep
            ),
            (pmesh.DATA_AXIS, pmesh.FSDP_AXIS, "ep"),
        )
    elif n_sp > 1:
        # sequence parallelism (cogvideox): latent frames shard over 'sp',
        # attention runs as ring attention inside a shard_map
        # (models/cogvideox.py sequence_parallel_apply) — distributed VIDEO
        # distillation beyond one chip's HBM. 'sp' innermost: the per-block
        # ring ppermute is the latency-critical collective. --fsdp composes
        # as an AUTOMATIC axis inside the shard_map: params/optimizer shard
        # over 'fsdp' (pure ZeRO weight sharding — fsdp devices cooperate
        # on the same rows here, batch_sharding covers 'data' only) while
        # GSPMD inserts the per-layer gathers. Reference long-video
        # surface: README.md:114-138 (single-GPU memory-bound).
        from jax.sharding import Mesh

        n_fsdp = max(cfg.fsdp, 1)
        if n_fsdp > 1:
            mesh = Mesh(
                np.asarray(devices).reshape(
                    n_dev // (n_fsdp * n_sp), n_fsdp, n_sp
                ),
                (pmesh.DATA_AXIS, pmesh.FSDP_AXIS, "sp"),
            )
        else:
            mesh = Mesh(
                np.asarray(devices).reshape(n_dev // n_sp, n_sp),
                (pmesh.DATA_AXIS, "sp"),
            )
    elif cfg.tp > 1:
        # --quant_forwards composes: the int8 interceptor traces global
        # shapes, so absmax scales lower to collectives and match the
        # unsharded path (test_quant.py::test_int8_under_tp)
        # ('data','fsdp','tp'): megatron tp innermost (per-layer psums ride
        # the tightest ICI ring), ZeRO-3 over 'fsdp', batch over 'data'
        mesh = ptp.make_train_mesh(
            n_dev // n_model, max(cfg.fsdp, 1), cfg.tp, devices=devices
        )
    else:
        n_fsdp = max(cfg.fsdp, 1)
        mesh = pmesh.make_mesh(n_dev // n_fsdp, n_fsdp, devices=devices)
    # --train_batch_size is PER-DATA-RANK (reference src/args.py: "per
    # device" under DDP/ZeRO, where every device is a data rank). Data
    # ranks = data x fsdp devices (batch_sharding shards rows over both —
    # ZeRO semantics); 'tp' devices cooperate on the SAME rows, so they
    # don't multiply the batch. Each HOST loads only its local rows
    # (pmesh.put_batch assembles the global array), matching accelerate's
    # per-rank DataLoader shards.
    n_data_ranks = n_dev // (max(cfg.tp, 1) * max(cfg.pp, 1) * n_ep * n_sp)
    if n_sp > 1:
        # under sp, 'fsdp' devices cooperate on the SAME rows (pure ZeRO
        # weight sharding — see pmesh.batch_sharding): they are not data
        # ranks and don't multiply the global batch
        n_data_ranks //= max(cfg.fsdp, 1)
    global_batch = cfg.train_batch_size * n_data_ranks
    local_batch = global_batch // jax.process_count()

    # ---- model: --model_family (reference demo = pixart only,
    # src/main.py:168-176; the other families train through the same
    # jitted step via train/families.py) ----
    tiny = os.environ.get("TDM_TINY_MODEL", "") == "1"  # smoke-test escape
    bundle = families.build(
        cfg.model_family,
        tiny=tiny,
        resolution=cfg.resolution,
        num_frames=cfg.num_frames,
        # --gradient_checkpointing → per-block remat, the torch
        # unet.enable_gradient_checkpointing() (reference src/main.py:191-193)
        gradient_checkpointing=cfg.gradient_checkpointing,
        # --mixed_precision → the denoiser's compute dtype (bf16 default;
        # 'no'/'fp32' forces f32 compute — reference src/main.py:330-338)
        mixed_precision=cfg.mixed_precision,
        allow_pooled_standin=cfg.allow_pooled_standin,
        # --moe_experts: MoE-PixArt student (models/moe.py); shard the
        # expert stacks with --ep
        moe_experts=cfg.moe_experts,
        moe_top_k=cfg.moe_top_k,
    )
    sample_shape = bundle.sample_shape
    seq_len = bundle.seq_len

    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    path = cfg.pretrained_model_name_or_path
    if os.path.isdir(path):
        from tdm_tpu.io import convert

        sd = convert.load_torch_state_dict(path)
        teacher = convert.to_jax(bundle.convert(sd))
        logger.info("loaded teacher weights from %s", path)
    else:
        teacher = bundle.init_params(rng)
        logger.warning(
            "no local checkpoint at %r — training from RANDOM teacher "
            "weights (smoke mode; real distillation needs ported weights)",
            path,
        )

    denoise_fn = bundle.denoise_fn
    # the plain (replicated-params) forward — validation grids always use
    # this one: their tiny fixed-prompt batches don't divide the pipeline's
    # microbatch schedule, and val params get replicated anyway
    plain_denoise_fn = bundle.denoise_fn
    if cfg.pp > 1:
        pp_kw = dict(
            num_microbatches=cfg.pp_microbatches or None,
            data_axis=pmesh.DATA_AXIS,
        )
        if cfg.model_family == "pixart":
            from tdm_tpu.models import pixart as pixart_mod

            pp_fwd = pixart_mod.make_pp_forward(bundle.model, mesh, **pp_kw)

            def denoise_fn(params, x, t, cond):  # noqa: F811 — pp override
                text, mask = cond
                return pixart_mod.epsilon(pp_fwd(params, x, t, text, mask))

        else:  # cogvideox (native v output, cond = masked text tensor)
            from tdm_tpu.models import cogvideox as cog_mod

            pp_fwd = cog_mod.make_pp_forward(bundle.model, mesh, **pp_kw)

            def denoise_fn(params, x, t, cond):  # noqa: F811 — pp override
                return pp_fwd(params, x, t, cond)

        logger.info(
            "pipeline parallelism: %d stages x %d microbatches",
            cfg.pp, cfg.pp_microbatches or cfg.pp,
        )
    elif n_sp > 1:
        # sequence-parallel denoiser: the SAME param tree, applied through
        # a shard_map that shards latent frames over 'sp' and runs every
        # attention as ring attention. Exactness vs the monolithic step:
        # tests/test_tdm_video.py + the CLI e2e. Validation keeps
        # plain_denoise_fn (tiny fixed-prompt batches, replicated params).
        import dataclasses as _dc

        from tdm_tpu.models import cogvideox as cog_mod

        mcfg = bundle.model.cfg
        if mcfg.sample_frames % n_sp:
            raise ValueError(
                f"--sp {n_sp} does not divide the latent frame count "
                f"{mcfg.sample_frames}"
            )
        sp_model = cog_mod.CogVideoXTransformer3D(
            cfg=_dc.replace(mcfg, sequence_parallel_axis="sp")
        )
        sp_fwd = cog_mod.sequence_parallel_apply(
            sp_model, mesh, data_axis=pmesh.DATA_AXIS
        )

        def denoise_fn(params, x, t, cond):  # noqa: F811 — sp override
            return sp_fwd(params, x, t, cond)

        logger.info(
            "sequence parallelism: %d-way frame sharding (ring attention)",
            n_sp,
        )

    # ---- data: prompts → embedding batches. get_batch() → (text, mask,
    # pooled-or-None); pooled rides SD3-style caches (CLIP-L/G vectors) ----
    uncond_pair = None  # (embed [L,D], mask [L]) — empty-prompt embedding
    uncond_pooled = None  # [P] — empty-prompt pooled vector (SD3 caches)
    emb_cache_path = os.environ.get("TDM_EMBEDDING_CACHE", "")
    if emb_cache_path and os.path.exists(emb_cache_path):
        cache = data_prompts.EmbeddingCache.load(emb_cache_path)
        batches = cache.batches(
            local_batch, seed=cfg.seed or 0,
            host_index=jax.process_index(), host_count=jax.process_count(),
        )

        def get_batch():
            b = next(batches)
            return b if len(b) == 3 else (*b, None)

        dataset_size = len(cache.prompts)

        def val_rows_fn():
            # dedicated validation rows (build_cache --validation_prompts);
            # raises with a rebuild hint when the cache predates them —
            # grids must render the SAME fixed prompts every cadence
            # (src/main.py:416-431), never arbitrary dataset rows
            return cache.validation_rows(cfg.validation_prompts)

        if cache.uncond_embed is not None:
            uncond_pair = (
                jnp.asarray(cache.uncond_embed, jnp.float32),
                jnp.asarray(cache.uncond_mask, jnp.int32),
            )
        if cache.uncond_pooled is not None:
            uncond_pooled = np.asarray(cache.uncond_pooled, np.float32)
        logger.info("streaming %d cached embeddings", len(cache.prompts))
    else:
        # no cache: tokenize + (random-init unless provided) encoder would
        # be meaningless — smoke mode uses hash-projected pseudo-embeddings
        # that are deterministic per prompt
        tok = tok_lib.HashTokenizer()
        src = cfg.train_data_dir
        batcher = None
        if src and os.path.isfile(src) and src.endswith((".txt", ".jsonl")):
            # native C++ mmap+prefetch loader (the dataloader-workers
            # equivalent); falls back to the Python batcher without g++
            from tdm_tpu.data import native_loader

            if native_loader.available():
                batcher = native_loader.NativePromptLoader(
                    src, local_batch, caption_column=cfg.caption_column,
                    tokenizer=tok, max_length=seq_len, seed=cfg.seed or 0,
                    host_index=jax.process_index(),
                    host_count=jax.process_count(),
                )
                logger.info(
                    "native loader: %d prompts from %s",
                    batcher.num_prompts, src,
                )
        dataset_size = None
        if batcher is not None:
            dataset_size = batcher.num_prompts
        else:
            prompt_list = data_prompts.load_prompts(
                src or list(cfg.validation_prompts) * 8,
                caption_column=cfg.caption_column,
                max_samples=cfg.max_train_samples,
                dataset_config_name=cfg.dataset_config_name,
            )
            dataset_size = len(prompt_list)
            batcher = iter(
                data_prompts.PromptBatcher(
                    prompt_list, local_batch, tokenizer=tok,
                    max_length=seq_len, seed=cfg.seed or 0,
                    host_index=jax.process_index(),
                    host_count=jax.process_count(),
                )
            )
        proj = np.random.default_rng(0).normal(
            size=(tok.vocab_size, bundle.embed_dim)
        ).astype(np.float32) * 0.02

        def get_batch():
            b = next(batcher)
            return proj[b["input_ids"]], b["attention_mask"], None

        def val_rows_fn():
            # smoke mode: the SAME hash-projection path as training, applied
            # to the actual --validation_prompts (deterministic per prompt)
            ids, m = tok(list(cfg.validation_prompts), max_length=seq_len)
            return proj[np.asarray(ids)], np.asarray(m), None

        logger.warning(
            "no TDM_EMBEDDING_CACHE — using hash pseudo-embeddings "
            "(smoke mode; build a T5 cache for real training)"
        )

    # ---- optimizers (recipe: README.md:157-178) ----
    # --gradient_accumulation_steps: optax.MultiSteps inside the jitted step
    # (the accelerator.accumulate equivalent, src/main.py:94,441) — grads
    # average over `accum` micro-steps, the optimizer fires on the last
    accum = max(cfg.gradient_accumulation_steps, 1)
    if cfg.max_train_steps and cfg.max_train_steps > 0:
        n_total_steps = cfg.max_train_steps
    else:
        # --max_train_steps 0/negative → epoch accounting, the reference's
        # max_train_steps-from-num_train_epochs derivation: optimizer steps
        # = epochs x ceil(batches_per_epoch / accum)
        batches_per_epoch = max(dataset_size // global_batch, 1)
        steps_per_epoch = max(-(-batches_per_epoch // accum), 1)
        n_total_steps = cfg.num_train_epochs * steps_per_epoch
        logger.info(
            "epoch accounting: %d prompts / global batch %d → %d optimizer "
            "steps/epoch x %d epochs = %d steps",
            dataset_size, global_batch, steps_per_epoch,
            cfg.num_train_epochs, n_total_steps,
        )
    lr = topt.make_lr_schedule(
        cfg.lr_scheduler,
        cfg.effective_lr(n_data_ranks),
        warmup_steps=cfg.lr_warmup_steps,
        total_steps=n_total_steps,
    )

    def make_tx():
        # --use_8bit_adam → blockwise-int8 moments (bitsandbytes parity)
        return topt.make_optimizer(
            lr, betas=(cfg.adam_beta1, cfg.adam_beta2), eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay, max_grad_norm=cfg.max_grad_norm,
            eight_bit=cfg.use_8bit_adam, accumulation_steps=accum,
        )

    tx_s = make_tx()
    tx_c = make_tx()

    # ---- the jitted TDM step ----
    tdm_cfg = tdm.TDMConfig(
        cfg=cfg.cfg, total_steps=cfg.total_steps, num_steps=cfg.num_steps,
        use_huber=cfg.use_huber, use_separate=cfg.use_separate,
        loss_mode=cfg.loss_mode, critic_updates=cfg.critic_updates,
        quant_forwards=cfg.quant_forwards,
        # EMA runs every micro-step but params are bit-constant within an
        # accumulation window, so d^accum reproduces exactly one 0.9999
        # decay per OPTIMIZER step (diffusers EMAModel steps once per
        # optimizer step, src/main.py:553-554)
        ema_decay=0.9999 ** (1.0 / accum),
    )
    schedule = bundle.schedule
    student_fn = None
    student_init = teacher
    lora_template = None
    if cfg.train_lora_rank > 0:
        # LoRA-mode: student state = adapter factors over the frozen base
        from tdm_tpu import lora as lora_lib

        lora_template = lora_lib.init_lora(
            teacher, jax.random.PRNGKey((cfg.seed or 0) + 99),
            rank=cfg.train_lora_rank,
        )
        student_fn = lora_lib.wrap_denoise_fn(denoise_fn, lora_template)
        # validation view merges over the PLAIN forward (see
        # plain_denoise_fn above)
        eval_student_fn = lora_lib.wrap_denoise_fn(
            plain_denoise_fn, lora_template
        )
        student_init = lora_template.params
        logger.info("LoRA training: rank %d, %d adapted modules",
                    cfg.train_lora_rank, len(lora_template.alpha))
    # eager 4-arg view for validation grids (not jitted, so binding the
    # base here is harmless; the jitted step threads the base as an arg)
    eval_denoise_fn = (
        (lambda p, x, t, c: eval_student_fn(p, x, t, c, teacher))
        if student_fn is not None
        else plain_denoise_fn
    )
    step_fn = tdm.build_train_step(
        denoise_fn, teacher, schedule, tdm_cfg, tx_s, tx_c,
        sample_shape=sample_shape, student_denoise_fn=student_fn,
    )
    state = tdm.init_state(
        student_init, teacher, tx_s, tx_c, use_ema=cfg.use_ema
    )
    if cfg.pp > 1:
        # stacked `blocks` subtrees (student/critic/EMA params, their
        # optimizer-state mirrors, and the teacher) shard their layer axis
        # over 'pp' — each stage holds only its own layers of all three
        # model copies; the per-stage slices are megatron-sharded over
        # 'tp' and ZeRO-3-sharded over 'fsdp' when those axes are >1
        # (pp_tp_fsdp_shardings; size-1 axes degrade to no-ops)
        from tdm_tpu.parallel import pp as ppp

        state = jax.device_put(state, ppp.pp_tp_fsdp_shardings(state, mesh))
        teacher = jax.device_put(
            teacher, ppp.pp_tp_fsdp_shardings(teacher, mesh)
        )
    elif n_ep > 1:
        # expert stacks (student/critic/EMA + optimizer mirrors + teacher)
        # shard over 'ep'; every other leaf follows the ZeRO-3 rule
        from tdm_tpu.models.moe import ep_shardings

        n_fsdp = max(cfg.fsdp, 1)
        rule = lambda names, shape: pmesh.fsdp_spec(shape, n_fsdp)  # noqa: E731
        state = jax.device_put(state, ep_shardings(state, mesh, base_rule=rule))
        teacher = jax.device_put(
            teacher, ep_shardings(teacher, mesh, base_rule=rule)
        )
    elif cfg.tp > 1 or cfg.fsdp > 1:
        # one combined rule for both regimes: attention/FF kernels
        # megatron-sharded over 'tp' when present (ZeRO-3 layered on their
        # remaining dim), everything else shape-based fsdp; axes absent
        # from the mesh degrade to size 1
        state = jax.device_put(state, ptp.tp_fsdp_shardings(state, mesh))
        teacher = jax.device_put(teacher, ptp.tp_fsdp_shardings(teacher, mesh))
    else:
        state = jax.device_put(state, pmesh.replicated(mesh))
        teacher = jax.device_put(teacher, pmesh.replicated(mesh))
    train_step = jax.jit(step_fn, donate_argnums=(0,))
    # activation layout constraints on plain GSPMD meshes (fsdp/tp): pin
    # the attention/adaLN activation (and thus cotangent) layouts so the
    # spmd partitioner never hits its "Involuntary full rematerialization"
    # fallback (parallel/mesh.py constrain — an all-gather + repartition
    # on the ICI critical path every step otherwise). OFF under the
    # shard_map paths (pp/sp): their manual mesh axes must not appear in
    # sharding constraints, and constrain() is a no-op without the context.
    _act_ctx = (
        pmesh.activation_sharding(mesh)
        if (cfg.pp <= 1 and n_sp <= 1 and (cfg.fsdp > 1 or cfg.tp > 1))
        else None
    )

    def run_train_step(*args):
        if _act_ctx is None:
            return train_step(*args)
        with _act_ctx:  # trace-time only; reentrant (sets/restores a global)
            return train_step(*args)

    # ---- resume ----
    mgr = ckpt_lib.CheckpointManager(
        out_dir, total_limit=cfg.checkpoints_total_limit
    )
    global_step = 0
    if cfg.resume_from_checkpoint:
        step0 = ckpt_lib.resolve_resume_step(out_dir, cfg.resume_from_checkpoint)
        if step0 is not None:
            state = mgr.restore(state, step0)
            global_step = int(step0)
            logger.info("resumed from checkpoint-%d", global_step)
        else:
            logger.info("no checkpoint found; starting fresh")

    metrics_log = log_lib.MetricLogger(
        os.path.join(out_dir, cfg.logging_dir),
        report_to=cfg.report_to, enabled=main_process,
    )
    timer = log_lib.StepTimer()

    # fixed validation inputs: the SAME --validation_prompts every cadence
    # (reference prompts src/main.py:424-429, noise key 42). Embeddings come
    # from the cache's dedicated validation rows (build_cache embeds them —
    # a cache without them errors with a rebuild hint) or, in smoke mode,
    # the hash-projection of the actual validation prompts. Only built when
    # grids will actually render (TDM_TAESD_DIR + image family).
    decode_fn = None
    val_cond = val_noise = None
    vae_dir = os.environ.get("TDM_TAESD_DIR", "")
    validation_active = bool(vae_dir) and len(sample_shape) == 3
    if validation_active:
        n_val = len(cfg.validation_prompts)
        val_noise = jax.random.normal(
            jax.random.PRNGKey(42), (n_val, *sample_shape), jnp.float32
        )
        val_text, val_mask, val_pooled = val_rows_fn()
        val_cond = bundle.cond_of(
            jnp.asarray(val_text, jnp.float32),
            jnp.asarray(val_mask, jnp.int32),
            None if val_pooled is None else jnp.asarray(val_pooled),
        )
    if validation_active:
        # TAESD decode for validation grids (src/main.py:166) — image
        # families only (TAESD3 for 16-ch SD3 latents); video validation
        # exports GIFs via the 3D-VAE pipeline path instead
        from tdm_tpu.io import convert

        vcfg = (
            vae_lib.TAESDConfig.taesd3()
            if bundle.latent_channels == 16
            else vae_lib.TAESDConfig()
        )
        dec = vae_lib.TAESDDecoder(cfg=vcfg)
        vparams = convert.to_jax(
            convert.taesd_params(convert.load_torch_state_dict(vae_dir))
        )
        decode_fn = jax.jit(
            lambda z: dec.apply({"params": vparams}, z / vcfg.scaling_factor)
        )

    # ---- loop (per-OPTIMIZER-step accounting — defect §2.5 fixed; with
    # --gradient_accumulation_steps N, N micro-steps advance global_step
    # once, matching accelerate's sync_gradients counting) ----
    # One SHARED key across hosts: replicated jit inputs must be identical
    # on every process; per-sample randomness comes from the batch axis
    # inside the step (all draws are batch-shaped from this one key).
    rng = jax.random.PRNGKey((cfg.seed or 0) + 1)
    micro_step = 0
    profiling = False  # an open jax.profiler trace to close on exit
    uncond = None  # built once: bit-identical every step (constant shapes)

    def to_global(cond_local):
        """cond pytree of HOST-LOCAL rows → global mesh-sharded arrays.
        cond_of runs on local data BEFORE this (its eager jnp math — e.g.
        the SD3 pooled fold — cannot run on non-fully-addressable global
        arrays under multi-host)."""
        return jax.tree.map(
            lambda a: pmesh.put_batch(np.asarray(a), mesh), cond_local
        )

    # ---- preemption safety: the first SIGTERM/SIGINT finishes the
    # in-flight optimizer step, checkpoints, and returns cleanly (TPU-pod
    # maintenance delivers SIGTERM to every host, so each process takes
    # this path and the orbax save stays collective); a second signal gets
    # the default handler (hard exit). The reference has no equivalent —
    # its recovery story is manual --resume_from_checkpoint only
    # (src/main.py:379-401). ----
    stop_signal: dict = {"signum": None}

    def _graceful(signum, frame):
        stop_signal["signum"] = signum
        signal.signal(signum, signal.SIG_DFL)
        logger.warning(
            "signal %d — will checkpoint and exit at the next optimizer "
            "step (send again to kill)", signum,
        )

    prev_handlers = {}
    try:
        for _sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[_sig] = signal.signal(_sig, _graceful)
    except ValueError:  # not on the main thread (embedded/library use)
        prev_handlers = {}

    while global_step < n_total_steps:
        text_np, mask_np, pooled_np = get_batch()  # [local_batch, ...] rows
        text_np = np.asarray(text_np, np.float32)
        mask_np = np.asarray(mask_np, np.int32)
        pooled_np = (
            None if pooled_np is None else np.asarray(pooled_np, np.float32)
        )
        cond = to_global(bundle.cond_of(text_np, mask_np, pooled_np))
        if uncond is None:
            # CFG null branch: the precomputed empty-prompt T5 embedding
            # when the cache carries it (src/main.py:416-431); zeros in
            # smoke mode. Hoisted out of the loop — rebuilding + re-putting
            # this constant every micro-step was pure host/transfer waste.
            if uncond_pair is not None:
                u_text = np.ascontiguousarray(np.broadcast_to(
                    np.asarray(uncond_pair[0], np.float32)[None],
                    text_np.shape,
                ))
                u_mask = np.ascontiguousarray(np.broadcast_to(
                    np.asarray(uncond_pair[1], np.int32)[None],
                    mask_np.shape,
                ))
            else:
                # smoke mode: zero embeds under a constant ALL-ONES mask —
                # capturing this batch's mask would freeze arbitrary
                # per-batch padding as the uncond mask for the whole run
                # (hash-tokenizer masks vary per batch)
                u_text = np.zeros_like(text_np)
                u_mask = np.ones_like(mask_np)
            if uncond_pooled is not None:
                u_pooled = np.ascontiguousarray(np.broadcast_to(
                    uncond_pooled[None],
                    (text_np.shape[0], *uncond_pooled.shape),
                ))
            elif pooled_np is not None:
                u_pooled = np.zeros_like(pooled_np)
            else:
                u_pooled = None
            uncond = to_global(bundle.cond_of(u_text, u_mask, u_pooled))
        rng, step_rng = jax.random.split(rng)
        # teacher passed as an ARGUMENT (not closure) so the 0.6B frozen
        # tree is a jit parameter, not baked-in HLO constants
        state, metrics = run_train_step(state, step_rng, cond, uncond, teacher)
        micro_step += 1
        if micro_step % accum != 0:
            continue  # mid-accumulation: params bit-unchanged, no cadence
        global_step += 1

        dt = timer.tick()
        if global_step % 10 == 0 or global_step == 1:
            m = {k: float(v) for k, v in metrics._asdict().items()}
            if dt:
                m["steps_per_sec"] = 1.0 / max(dt, 1e-9)
            metrics_log.log(m, global_step)
            logger.info(
                "step %d loss_student %.4f loss_critic %.4f",
                global_step, m["loss_student"], m["loss_critic"],
            )
        if decode_fn is not None and global_step % cfg.validation_steps == 0:
            # validate the EMA weights when tracked (diffusers EMAModel
            # copy-to semantics, src/main.py:553-554). Runs on ALL
            # processes (resharding fsdp-sharded params to replicated is a
            # collective — gating it on process 0 would deadlock); only
            # the file/tracker writes are main-process-only.
            val_params = state.ema if cfg.use_ema else state.student
            if cfg.fsdp > 1 or cfg.tp > 1 or cfg.pp > 1 or cfg.ep > 1:
                val_params = jax.device_put(val_params, pmesh.replicated(mesh))
            grids = validation.save_validation_images(
                eval_denoise_fn, val_params, schedule, val_cond,
                val_noise, decode_fn, output_dir=out_dir, step=global_step,
                total_steps=cfg.total_steps, write=main_process,
            )
            for k_nfe, grid in grids.items():
                metrics_log.log_image(
                    f"validation/{k_nfe}nfe", grid, global_step
                )
        if global_step % cfg.checkpointing_steps == 0:
            mgr.save(global_step, state)
            logger.info("saved checkpoint-%d", global_step)
        if cfg.profile_steps > 0 and global_step == 10 and main_process:
            # trace the next N steady-state steps (xplane dump for xprof)
            prof_dir = os.path.join(out_dir, "profile")
            jax.profiler.start_trace(prof_dir)
            profiling = True
        if (
            profiling
            and global_step >= 10 + cfg.profile_steps
        ):
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            profiling = False
            logger.info("profile written to %s/profile", out_dir)
        if stop_signal["signum"] is not None:
            break

    if profiling:
        # loop ended (max steps / SIGTERM) mid-trace: close it so the
        # xplane dump is written rather than lost with an open trace
        jax.block_until_ready(state)
        jax.profiler.stop_trace()
        logger.info("profile written to %s/profile", out_dir)
    for _sig, _h in prev_handlers.items():  # in-process callers keep theirs
        signal.signal(_sig, _h)
    mgr.wait()  # settle async saves so latest_step() sees them
    if mgr.latest_step() != global_step:
        mgr.save(global_step, state)
    mgr.wait()
    if stop_signal["signum"] is not None:
        logger.warning(
            "preempted by signal %d at step %d — checkpoint saved; resume "
            "with --resume_from_checkpoint latest",
            stop_signal["signum"], global_step,
        )
        metrics_log.close()
        return

    # ---- final artifacts: student weights + extracted kohya LoRA (the
    # reference's released-checkpoint form, README.md:140-144). The
    # replicate-gather below is a collective over the mesh, so it runs on
    # every process; only the file writes are main-process-gated. ----
    from tdm_tpu.io import params as params_io
    from tdm_tpu.lora import LoRA, extract_lora, merge, save_kohya

    final = state.ema if cfg.use_ema else state.student
    if cfg.fsdp > 1 or cfg.tp > 1 or cfg.pp > 1 or cfg.ep > 1:
        # gather shards → every host holds the full tree; pull to host so
        # the (main-process-only) merge/SVD below never touches the mesh
        final = jax.tree.map(
            np.asarray, jax.device_put(final, pmesh.replicated(mesh))
        )
        teacher = jax.tree.map(
            np.asarray, jax.device_put(teacher, pmesh.replicated(mesh))
        )
    if main_process:
        if lora_template is not None:
            # LoRA mode: the trained factors ARE the artifact; also write
            # the merged student for direct pipeline use
            trained = LoRA(params=final, alpha=lora_template.alpha)
            save_kohya(
                trained, os.path.join(out_dir, "tdm_lora.safetensors"),
                prefix="lora_transformer",
            )
            final = merge(teacher, trained)
        params_io.save_params(
            final, os.path.join(out_dir, "student.safetensors"),
            dtype=np.float16,
        )
        if lora_template is None and cfg.export_lora_rank > 0:
            lora = extract_lora(teacher, final, rank=cfg.export_lora_rank)
            save_kohya(
                lora, os.path.join(out_dir, "tdm_lora.safetensors"),
                prefix="lora_transformer",
            )
        logger.info("exported student.safetensors (+ tdm_lora.safetensors)")
        if cfg.push_to_hub:
            # reference: create_repo + upload_folder gated on the flag
            # (src/main.py:36,125-128); repo id defaults to the output dir
            # basename like the reference's Path(output_dir).name
            from tdm_tpu.io import hub as hub_io

            repo_id = cfg.hub_model_id or os.path.basename(
                os.path.normpath(out_dir)
            )
            url = hub_io.push_to_hub(
                out_dir, repo_id, token=cfg.hub_token,
                commit_message=f"tdm_tpu checkpoint (step {global_step})",
            )
            logger.info("pushed %s to hub: %s", out_dir, url)
    metrics_log.close()
    logger.info("done at step %d", global_step)


if __name__ == "__main__":
    main(sys.argv[1:])
