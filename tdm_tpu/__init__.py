"""tdm_tpu — a TPU-native few-step diffusion distillation framework.

A ground-up JAX / Flax / optax / Pallas rebuild of the capability surface of
TDM ("Trajectory Distribution Matching", arXiv:2503.06674; reference repo
nauka117/TDM): image-free distillation of text-to-image / text-to-video
diffusion models into 4-NFE students, plus a diffusers-style inference API
with LoRA adapters and a fused multistep DPM-Solver sampler.

Layer map (bottom → top):
  core/      noise schedules, few-step trajectory sampling, DPM-Solver — pure jnp
  ops/       Pallas TPU kernels (flash attention, ring attention, dynamic
             int8 matmuls) + portable fallbacks
  models/    Flax denoisers (PixArt-α DiT, SD1.5 UNet, SD3 MMDiT, CogVideoX),
             VAEs (KL / TAESD / 3D), text encoders (T5, CLIP)
  lora/      low-rank adapters as scaled einsums + kohya/diffusers safetensors I/O
  parallel/  device mesh + sharding rules: data-parallel / FSDP (ZeRO-3) /
             megatron TP / GPipe PP over the stacked layer axis; multi-slice
             DCN-aware device ordering
  train/     the TDM train step (student / fake-score critic / frozen teacher)
             compiled to one sharded jitted function; optimizers, validation
  data/      prompt pipeline (training is image-free: prompts only) +
             native C++ loader
  io/        safetensors converters, param trees, hub resolution/push
  pipelines/ diffusers-mirroring public inference API
  serve/     micro-batching HTTP daemon (tdm-serve)
  eval/      CLIP-score quality metric (tdm-eval)
  utils/     config, checkpointing (orbax), logging
"""

__version__ = "0.1.0"
