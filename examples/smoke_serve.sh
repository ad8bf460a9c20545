#!/usr/bin/env bash
# Serving smoke: distilled tiny pipeline behind the tdm-serve HTTP daemon.
# Exercises: pipeline dir + embedding cache -> micro-batching server ->
# concurrent /generate requests -> PNG responses + batching stats.
# Reuses smoke_distill.sh's output if present, else runs it first.
set -euo pipefail
OUT=${1:-/tmp/tdm_smoke}
RUN_DIR="${OUT}_cfg4.5_steps900_Huber"
[ -d "$RUN_DIR/pipe" ] || "$(dirname "$0")/smoke_distill.sh" "$OUT"
export JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu

python -m tdm_tpu.serve.server \
  --model "$RUN_DIR/pipe" --embedding_cache "$RUN_DIR/cache.npz" \
  --batch_size 2 --max_delay_ms 200 --num_inference_steps 4 \
  --warmup --host 127.0.0.1 --port 8731 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

for i in $(seq 1 60); do
  curl -sf http://127.0.0.1:8731/healthz >/dev/null && break
  sleep 1
done

# two concurrent requests coalesce into one compiled batch-2 call
curl -s http://127.0.0.1:8731/generate \
  -d '{"prompt": "a cat", "seed": 8888}' > /tmp/serve_a.json &
curl -s http://127.0.0.1:8731/generate \
  -d '{"prompt": "a dog", "seed": 317}' > /tmp/serve_b.json &
wait %2 %3

python - <<'PY'
import base64, io, json
import numpy as np
for name in ("/tmp/serve_a.json", "/tmp/serve_b.json"):
    p = json.load(open(name))
    if p["format"] == "png":  # pipeline with a VAE attached decodes to pixels
        png = base64.b64decode(p["image"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n", name
        size = len(png)
    else:  # smoke pipe has no VAE -> raw latents round-trip as .npy
        raw = base64.b64decode(p["latents"])
        arr = np.load(io.BytesIO(raw))
        assert list(arr.shape) == p["shape"] and np.isfinite(arr).all(), name
        size = raw.__len__()
    print(name, "->", p["format"], p["shape"], f"{size}B seed={p['seed']}")
PY
echo "--- stats ---"
curl -s http://127.0.0.1:8731/stats
echo
