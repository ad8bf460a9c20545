#!/usr/bin/env bash
# Pre-snapshot gate: execute the driver's multi-chip dryrun END TO END,
# exactly as the driver will (python __graft_entry__.py → dryrun_multichip(8)
# → one CPU virtual-mesh subprocess per variant).
#
# Round-4 shipped a MULTICHIP_r04.json with ok:false because the end-of-round
# state was never re-validated after a late change to the sp-train variant.
# Run this before ANY end-of-round snapshot — and after ANY change to
# __graft_entry__.py, tdm_tpu/parallel/, tdm_tpu/ops/ring_attention.py, or
# tdm_tpu/train/tdm.py. Expected wall: ~4 min warm cache, ~25 min cold, on
# an otherwise-idle box (the 1-core host serializes the 8 device threads —
# docs/ENVIRONMENT_NOTES.md #21; concurrent pytest runs starve it).
#
# Exit code 0 = all variants green (the tail shows the per-variant verdict).
set -u
cd "$(dirname "$0")/.."
echo "[check_multichip] $(date -u +%FT%TZ) starting full dryrun_multichip(8)"
time python __graft_entry__.py
rc=$?
echo "[check_multichip] exit=$rc"
exit $rc
