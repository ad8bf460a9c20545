#!/usr/bin/env bash
# TDM distillation smoke: tiny PixArt, CPU, no checkpoints needed.
# Exercises: config parity flags -> jitted TDM step -> metrics/checkpoints
# -> resume -> artifact export -> inference CLI on the result.
set -euo pipefail
OUT=${1:-/tmp/tdm_smoke}
export TDM_TINY_MODEL=1 JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu

python -m tdm_tpu.cli.train_tdm \
  --output_dir "$OUT" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 2 --max_train_steps 4 --checkpointing_steps 2 \
  --learning_rate 1e-4 --cfg 4.5 --total_steps 900 \
  --use_huber --use_separate --seed 0 --max_devices 1

# resume for 2 more steps from the saved state
python -m tdm_tpu.cli.train_tdm \
  --output_dir "$OUT" --train_data_dir "" --dataset_name smoke \
  --train_batch_size 2 --max_train_steps 6 --checkpointing_steps 2 \
  --learning_rate 1e-4 --cfg 4.5 --total_steps 900 \
  --use_huber --use_separate --seed 0 --max_devices 1 \
  --resume_from_checkpoint latest

RUN_DIR="${OUT}_cfg4.5_steps900_Huber"
echo "--- artifacts ---"; ls "$RUN_DIR"
echo "--- metrics tail ---"; tail -2 "$RUN_DIR/logs/metrics.jsonl"

# package the trained student as a pipeline dir and sample from it
export RUN_DIR
python - <<'PY'
import os

import numpy as np

from tdm_tpu.data.prompts import EmbeddingCache
from tdm_tpu.io import params as pio
from tdm_tpu.models import pixart
from tdm_tpu.pipelines.loading import save_pretrained

run = os.environ["RUN_DIR"]
cfg = pixart.PixArtConfig.tiny()
student = pio.load_params(os.path.join(run, "student.safetensors"))
save_pretrained(
    os.path.join(run, "pipe"), family="pixart", transformer_params=student,
    model_config={
        "sample_size": cfg.sample_size, "num_layers": cfg.num_layers,
        "num_heads": cfg.num_heads, "head_dim": cfg.head_dim,
        "caption_dim": cfg.caption_dim, "dtype": "float32",
        "attn_impl": "xla",
    },
)
rng = np.random.default_rng(0)
EmbeddingCache(
    rng.normal(size=(2, 8, cfg.caption_dim)).astype(np.float16),
    np.ones((2, 8), np.int64), ["a cat", "a dog"],
).save(os.path.join(run, "cache.npz"))
PY
python -m tdm_tpu.cli.generate --model "$RUN_DIR/pipe" --prompt "a cat" \
  --embedding_cache "$RUN_DIR/cache.npz" --num_inference_steps 4 \
  --seed 8888 --output "$RUN_DIR/sample" --output_type latent
echo "--- generated ---"; ls "$RUN_DIR"/sample*
