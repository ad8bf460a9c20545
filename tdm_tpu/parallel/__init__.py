"""Device mesh + sharding rules: DP + FSDP over ('data','fsdp'), and
megatron-style tensor parallelism over ('data','tp') (parallel/tp.py)."""

from tdm_tpu.parallel import mesh, tp  # noqa: F401
