#!/usr/bin/env bash
# Sequence-parallel VIDEO distillation smoke: tiny CogVideoX with latent
# frames sharded over a ('data','sp') mesh — every attention in the jitted
# TDM step runs as ring attention (tdm-train --sp, round-4 surface).
# CPU with 4 virtual devices; real runs use the same flags on TPU.
set -euo pipefail
OUT=${1:-/tmp/tdm_smoke_video_sp}
export TDM_TINY_MODEL=1 JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=4 ${XLA_FLAGS:-}"

# --num_frames 5 → 2 latent frames (1 + (5-1)/4), divisible by --sp 2;
# mesh = data 2 × sp 2
python -m tdm_tpu.cli.train_tdm \
  --output_dir "$OUT" --train_data_dir "" --dataset_name smoke \
  --model_family cogvideox --sp 2 --num_frames 5 \
  --train_batch_size 1 --max_train_steps 2 --checkpointing_steps 2 \
  --learning_rate 1e-4 --seed 0 --max_devices 4

RUN_DIR="${OUT}_cfg4.5_steps900"
echo "--- artifacts ---"; ls "$RUN_DIR"
echo "--- metrics tail ---"; tail -1 "$RUN_DIR/logs/metrics.jsonl"
echo "OK: sequence-parallel video TDM step trained + exported"
