#!/usr/bin/env bash
# Multi-chip smoke on 8 VIRTUAL CPU devices: data-parallel + FSDP=2
# (ZeRO-3-equivalent param/optimizer sharding). On a real TPU host, drop
# the XLA_FLAGS/JAX_PLATFORMS lines — all local chips join the mesh
# automatically.
set -euo pipefail
OUT=${1:-/tmp/tdm_smoke_mc}
export TDM_TINY_MODEL=1 JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

python -m tdm_tpu.cli.train_tdm \
  --output_dir "$OUT" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 1 --max_train_steps 2 --checkpointing_steps 2 \
  --learning_rate 1e-4 --seed 0 --fsdp 2

RUN_DIR="${OUT}_cfg4.5_steps900"
echo "--- metrics ---"; cat "$RUN_DIR/logs/metrics.jsonl"

# 3-axis variant: DDP x ZeRO-3 x megatron tensor parallelism in one step
python -m tdm_tpu.cli.train_tdm \
  --output_dir "${OUT}_tp" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 1 --max_train_steps 2 --checkpointing_steps 2 \
  --learning_rate 1e-4 --seed 0 --fsdp 2 --tp 2

echo "--- tp metrics ---"; cat "${OUT}_tp_cfg4.5_steps900/logs/metrics.jsonl"

# pipeline-parallel variant: the layer stack GPipe-sharded over 'pp' —
# each stage holds only L/2 layers of student+critic+teacher weights and
# optimizer state (parallel/pp.py). Composes with the other axes: add
# `--fsdp 2 --tp 2` for the full ('data','pp','fsdp','tp') matrix.
python -m tdm_tpu.cli.train_tdm \
  --output_dir "${OUT}_pp" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 2 --max_train_steps 2 --checkpointing_steps 2 \
  --learning_rate 1e-4 --seed 0 --pp 2

echo "--- pp metrics ---"; cat "${OUT}_pp_cfg4.5_steps900/logs/metrics.jsonl"

# expert-parallel variant: a mixture-of-experts student (models/moe.py) —
# each block's MLP becomes 4 routed experts, and the expert stacks shard
# over the 'ep' axis of a ('data','fsdp','ep') mesh (research extension).
python -m tdm_tpu.cli.train_tdm \
  --output_dir "${OUT}_ep" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 2 --max_train_steps 2 --checkpointing_steps 2 \
  --learning_rate 1e-4 --seed 0 --moe_experts 4 --ep 2 --max_devices 4

echo "--- ep metrics ---"; cat "${OUT}_ep_cfg4.5_steps900/logs/metrics.jsonl"
